"""Output sinks.

Primary sink is partitioned Parquet (``Dataset.write_parquet`` everywhere in
the pipelines); this module adds the reference-compatible artifacts:

- DuIE-style prediction JSONL — one ``{"text": ..., "spo_list": [...]}``
  object per line, utf-8, no ascii escaping (parity:
  ``write_prediction_results``, ``/root/reference/utils/utils.py:275-282``),
  assembled per turn from the triples table.
"""

from __future__ import annotations

from .readers import table_from_pandas

import json

import pyarrow as pa


def triples_to_duie_rows(batch: pa.Table, text_for=None) -> pa.Table:
    """Triples batch -> per-turn DuIE prediction rows (turn_key, json_line).

    ``text_for(conv_id, turn_idx)`` supplies the turn text (defaults to the
    synthetic corpus regenerator).  Emits one row per (conv_id, turn_idx)
    present in the batch — the extractor keeps each turn's triples within
    one batch, so no cross-batch merge is needed.
    """
    if text_for is None:
        from .transcripts import turn_text

        def text_for(cid, tix):  # noqa: F811
            return turn_text(int(cid.rsplit("-", 1)[1]), tix)

    per_turn: dict[tuple[str, int], list[dict]] = {}
    for i in range(batch.num_rows):
        key = (batch["conv_id"][i].as_py(), batch["turn_idx"][i].as_py())
        spo = {
            "predicate": batch["predicate"][i].as_py(),
            "subject": batch["subject"][i].as_py(),
            "subject_type": batch["subject_type"][i].as_py(),
            "object": json.loads(batch["object_json"][i].as_py()),
            "object_type": json.loads(batch["object_type_json"][i].as_py()),
        }
        per_turn.setdefault(key, []).append(spo)

    keys, lines = [], []
    for (cid, tix), spo_list in per_turn.items():
        keys.append(f"{cid}:{tix}")
        lines.append(
            json.dumps(
                {"text": text_for(cid, tix), "spo_list": spo_list},
                ensure_ascii=False,
            )
        )
    return pa.Table.from_pydict(
        {
            "turn_key": pa.array(keys, pa.string()),
            "json_line": pa.array(lines, pa.string()),
        }
    )


def write_prediction_jsonl(triples_ds, path: str) -> int:
    """Materialize the DuIE prediction artifact to one JSONL file.

    A ``groupby(conv_id, turn_idx)`` co-locates each turn's triples first,
    so the per-turn assembly is correct under ANY upstream batching
    (checkpoint-re-read triples can straddle batch boundaries).  Driver-side
    small-result write (the artifact is an eval byproduct, not the data
    path — bulk output stays Parquet).  Returns line count.
    """

    def per_turn(df) -> "pa.Table":
        return triples_to_duie_rows(
            table_from_pandas(df, preserve_index=False)
        )

    rows = (
        triples_ds.groupby(["conv_id", "turn_idx"])
        .map_groups(per_turn, batch_format="pandas")
        .to_pandas()
    )
    rows = rows.sort_values("turn_key")
    with open(path, "w", encoding="utf-8") as f:
        for line in rows["json_line"]:
            f.write(line)
            f.write("\n")
    return len(rows)
