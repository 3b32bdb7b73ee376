"""Train-time per-subject example explosion (MPN training path).

The reference's MPN training set emits ONE example per (sentence, subject)
with ``tmp_spoes`` holding just that subject's object pointers
(``/root/reference/dataset/dataset_mpn.py:91-106``); evaluation keeps one
example per sentence.  Ray Data shape: a ``flat_map``-style ``map_batches``
over transcript turns — each turn fans out to one row per gold subject
span, carrying that subject's po list as a JSON column.  The inference
engine never uses this (SURVEY §2.1 S2: "train only"); it exists for
training-pipeline parity and is exercised by tests.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .base import normalize_text
from .mpn_head import build_gold_spoes
from ..tokenization import CLS, SEP, convert_to_tokens


def explode_per_subject(batch: pa.Table, gold_for=None) -> pa.Table:
    """Transcript batch -> one training row per (turn, gold subject span)."""
    if gold_for is None:
        from ..pipelines.extract import _synthetic_gold as gold_for  # noqa

    out = {
        "conv_id": [], "turn_idx": [], "text": [],
        "subject_start": [], "subject_end": [], "n_subjects": [],
        "po_json": [],
    }
    for i in range(batch.num_rows):
        cid = batch["conv_id"][i].as_py()
        tix = batch["turn_idx"][i].as_py()
        text = normalize_text(batch["text"][i].as_py())
        tokens, _, _ = convert_to_tokens(text)
        tokens = [CLS] + tokens + [SEP]
        spoes, _ = build_gold_spoes(tokens, gold_for(cid, tix))
        for s, po in spoes.items():
            out["conv_id"].append(cid)
            out["turn_idx"].append(tix)
            out["text"].append(text)
            out["subject_start"].append(s[0])
            out["subject_end"].append(s[1])
            out["n_subjects"].append(len(spoes))
            out["po_json"].append(json.dumps(po))
    return pa.Table.from_pydict(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "text": pa.array(out["text"], pa.string()),
            "subject_start": pa.array(out["subject_start"], pa.int32()),
            "subject_end": pa.array(out["subject_end"], pa.int32()),
            "n_subjects": pa.array(out["n_subjects"], pa.int32()),
            "po_json": pa.array(out["po_json"], pa.string()),
        }
    )
