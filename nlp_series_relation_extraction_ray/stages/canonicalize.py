"""Canonicalization: linked mention stream -> deduplicated node table.

The wide shuffle of the pipeline (SURVEY §2.6 G4), executed as a two-phase
salted aggregate so one skewed head entity (the fixture corpus routes ~25% of
person mentions to one entity on purpose) cannot pin a single reducer:

1. in-batch combine (``map_batches``): mentions collapse to at most one
   partial row per (entity_id, salt) per batch — the map-side combiner;
2. ``groupby([entity_id, salt]).map_groups`` merges partials per salt bucket;
3. ``groupby(entity_id).map_groups`` merges the ≤ SALT_BUCKETS remaining
   rows per entity into the final node.

Deterministic outputs: entity_type is the lexicographic min of observed
mention types for unlinked nodes (KB type wins for linked nodes), aliases are
the sorted distinct observed surfaces, all independent of partitioning.
"""

from __future__ import annotations

import json
import unicodedata
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

SALT_BUCKETS = 16

NODE_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("entity_type", pa.string()),
        ("mention_count", pa.int64()),
        ("aliases_json", pa.string()),
    ]
)


def norm_surface(s: str) -> str:
    """NFKC + casefold + strip book-title brackets and whitespace."""
    s = unicodedata.normalize("NFKC", s).strip().casefold()
    return s.strip("《》〈〉　 ")


def _salt(conv_id: str) -> int:
    return zlib.crc32(conv_id.encode()) % SALT_BUCKETS


def partial_nodes(batch: pa.Table) -> pa.Table:
    """Phase-1 map-side combiner: one partial row per (entity_id, salt)."""
    acc: dict[tuple[str, int], dict] = {}
    eids = batch["entity_id"].to_pylist()
    convs = batch["conv_id"].to_pylist()
    canons = batch["canonical_name"].to_pylist()
    mtypes = batch["mention_type"].to_pylist()
    surfaces = batch["surface"].to_pylist()
    for i in range(batch.num_rows):
        key = (eids[i], _salt(convs[i]))
        a = acc.get(key)
        if a is None:
            a = acc[key] = {
                "canonical_name": canons[i],
                "types": set(),
                "surfaces": set(),
                "count": 0,
            }
        a["types"].add(mtypes[i])
        a["surfaces"].add(surfaces[i])
        a["count"] += 1
    return pa.Table.from_pydict(
        {
            "entity_id": pa.array([k[0] for k in acc], pa.string()),
            "salt": pa.array([k[1] for k in acc], pa.int32()),
            "canonical_name": pa.array(
                [a["canonical_name"] for a in acc.values()], pa.string()
            ),
            "types_json": pa.array(
                [json.dumps(sorted(a["types"]), ensure_ascii=False)
                 for a in acc.values()],
                pa.string(),
            ),
            "surfaces_json": pa.array(
                [json.dumps(sorted(a["surfaces"]), ensure_ascii=False)
                 for a in acc.values()],
                pa.string(),
            ),
            "count": pa.array([a["count"] for a in acc.values()], pa.int64()),
        }
    )


def _merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    types: set[str] = set()
    surfaces: set[str] = set()
    for tj, sj in zip(df["types_json"], df["surfaces_json"]):
        types.update(json.loads(tj))
        surfaces.update(json.loads(sj))
    return pd.DataFrame(
        {
            "entity_id": [df["entity_id"].iloc[0]],
            "salt": np.array([0], dtype=np.int32),
            "canonical_name": [df["canonical_name"].iloc[0]],
            "types_json": [json.dumps(sorted(types), ensure_ascii=False)],
            "surfaces_json": [json.dumps(sorted(surfaces), ensure_ascii=False)],
            "count": [int(df["count"].sum())],
        }
    )


def _finalize(df: pd.DataFrame, kb_type_by_id: dict[str, str]) -> pd.DataFrame:
    merged = _merge_partials(df)
    eid = merged["entity_id"].iloc[0]
    types = json.loads(merged["types_json"].iloc[0])
    etype = kb_type_by_id.get(eid) or (min(types) if types else "Text")
    return pd.DataFrame(
        {
            "entity_id": [eid],
            "canonical_name": [merged["canonical_name"].iloc[0]],
            "entity_type": [etype],
            "mention_count": [int(merged["count"].iloc[0])],
            "aliases_json": [merged["surfaces_json"].iloc[0]],
        }
    )


def canonicalize_nodes(linked_mentions_ds, kb_rows: list[dict] | None = None):
    """Linked mention Dataset -> node Dataset (two-phase salted aggregate)."""
    if kb_rows is None:
        from ..sources.kb import build_alias_kb

        kb_rows = build_alias_kb()
    kb_type_by_id = {r["entity_id"]: r["entity_type"] for r in kb_rows}

    partials = linked_mentions_ds.map_batches(
        partial_nodes, batch_format="pyarrow"
    )
    per_salt = partials.groupby(["entity_id", "salt"]).map_groups(
        _merge_partials, batch_format="pandas"
    )
    nodes = per_salt.groupby("entity_id").map_groups(
        lambda df: _finalize(df, kb_type_by_id), batch_format="pandas"
    )
    return nodes
