"""Full KG-construction pipeline (north_star):

    transcripts ─ extract (actor pool) ─ triples ─┬─ mentions → link → canonicalize → nodes
                                                  └─ edge combine → dedup/weight → edges

Stage boundaries are Parquet directories: ``out_dir/triples``,
``out_dir/nodes``, ``out_dir/edges``.  Triples are written once and re-read by
the two downstream consumers — re-reading a checkpoint beats re-executing the
extraction lineage twice, and the checkpoint is what makes a rerun resumable
(``state/checkpoint.py``).

Also hosts conversation reconstruction (G3): ``groupby(conv_id)`` +
intra-group sort by ``turn_idx`` — the stage that witnesses the per-turn text
invariant from BASELINE.json's ``input_hint``.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from .extract import extract_triples


def reconstruct_conversations(transcripts_ds):
    """Per-conversation summary after restoring stable turn order.

    Rows arrive physically shuffled; each group is sorted by ``turn_idx``
    before the rolling text digest, so the digest is a pure function of the
    conversation content — the per-turn text-equality invariant.
    """

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        digest = hashlib.sha256()
        for t in df["text"]:
            digest.update(t.encode())
            digest.update(b"\x00")
        return pd.DataFrame(
            {
                "conv_id": [df["conv_id"].iloc[0]],
                "n_turns": [len(df)],
                "turn_idx_sum": [int(df["turn_idx"].sum())],
                "n_roles": [int(df["role"].nunique())],
                "text_sha": [digest.hexdigest()],
            }
        )

    return transcripts_ds.groupby("conv_id").map_groups(
        summarize, batch_format="pandas"
    )


def kg_nodes(triples_ds, alias_index_ref=None, concurrency=None):
    """Triples -> canonical node table (link + salted canonicalization)."""
    import ray

    from ..stages.canonicalize import canonicalize_nodes
    from ..stages.linking import EntityLinker, mentions_from_triples

    from ..stages.linking import task_link  # noqa: F401

    mentions = triples_ds.map_batches(
        mentions_from_triples, batch_format="pyarrow"
    )
    ref_key = alias_index_ref.hex() if alias_index_ref is not None else "kb"
    linked = mentions.map_batches(
        task_link,
        fn_kwargs={"ref_key": ref_key, "alias_index_ref": alias_index_ref},
        batch_format="pyarrow",
    )
    return canonicalize_nodes(linked)


def kg_edges(triples_ds, alias_index_ref=None, concurrency=None):
    from ..stages.graph import materialize_edges

    return materialize_edges(
        triples_ds, alias_index_ref=alias_index_ref, concurrency=concurrency
    )


def build_kg(transcripts_ds, head: str = "baseline", out_dir: str | None = None):
    """Run the full pipeline; returns {triples, nodes, edges} Datasets.

    With ``out_dir`` set, each stage is checkpointed to
    ``{out_dir}/<name>`` Parquet and downstream stages read the
    checkpoint (the resumable production shape); without it everything stays
    in-memory lineage (tests).
    """
    import ray

    triples = extract_triples(transcripts_ds, head=head)
    if out_dir:
        triples_dir = f"{out_dir}/triples"
        triples.write_parquet(triples_dir)
        triples = ray.data.read_parquet(triples_dir)

    from ..sources.kb import build_alias_index

    alias_ref = ray.put(build_alias_index())

    nodes = kg_nodes(triples, alias_index_ref=alias_ref)
    edges = kg_edges(triples, alias_index_ref=alias_ref)
    if out_dir:
        nodes_dir = f"{out_dir}/nodes"
        edges_dir = f"{out_dir}/edges"
        nodes.write_parquet(nodes_dir)
        edges.write_parquet(edges_dir)
        nodes = ray.data.read_parquet(nodes_dir)
        edges = ray.data.read_parquet(edges_dir)
    return {"triples": triples, "nodes": nodes, "edges": edges}


def kg_node_degrees(edges_ds):
    """Graph analytics over the materialized edge table: per-node out/in
    degree and weighted degree — a second-order aggregate proving the edge
    table is queryable as a graph.  Shape: map-side partials (one row per
    entity per batch) + one hash-bucketed vectorized reduce; entity
    cardinality never concentrates on a single reducer."""
    import pyarrow as pa

    from ..functions.grouping import bucketed_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("src_id").agg(
            out_degree=("dst_id", "size"), out_weight=("weight", "sum")
        ).reset_index().rename(columns={"src_id": "entity_id"})
        inn = df.groupby("dst_id").agg(
            in_degree=("src_id", "size"), in_weight=("weight", "sum")
        ).reset_index().rename(columns={"dst_id": "entity_id"})
        merged = out.merge(inn, on="entity_id", how="outer").fillna(0)
        return pa.Table.from_pandas(merged, preserve_index=False)

    partials = edges_ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every entity in the hash bucket
        out = df.groupby("entity_id", as_index=False)[
            ["out_degree", "out_weight", "in_degree", "in_weight"]
        ].sum()
        for c in ("out_degree", "out_weight", "in_degree", "in_weight"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_apply(partials, "entity_id", merge)
