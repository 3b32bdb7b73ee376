"""Tensor-boundary utilities, JSONL sink, train-time explosion, custom-head
registration (the reference's user-extension surface)."""

import json

import numpy as np
import pyarrow as pa

from nlp_series_relation_extraction_ray.functions.tensors import (
    batch_gather,
    sequence_padding,
)


def test_sequence_padding_scalar():
    out = sequence_padding([[1, 2], [3], [4, 5, 6]])
    assert out.shape == (3, 3)
    assert out[1].tolist() == [3, 0, 0]


def test_sequence_padding_truncate_and_fixed_length():
    out = sequence_padding([[1, 2, 3, 4]], length=2)
    assert out.tolist() == [[1, 2]]


def test_sequence_padding_multidim_fill():
    # reference pads object labels with np.zeros((R,2)) units
    rows = [np.ones((2, 3, 2)), np.ones((1, 3, 2))]
    out = sequence_padding(rows, padding=np.zeros((3, 2)))
    assert out.shape == (2, 2, 3, 2)
    assert out[1, 1].sum() == 0


def test_batch_gather():
    data = np.arange(24).reshape(2, 3, 4)
    idx = np.array([1, 2])
    out = batch_gather(data, idx)
    assert out.tolist() == [data[0, 1].tolist(), data[1, 2].tolist()]


def test_duie_jsonl_sink(ray_session, tmp_path):
    from nlp_series_relation_extraction_ray.pipelines.extract import (
        extract_triples,
    )
    from nlp_series_relation_extraction_ray.sources.sinks import (
        write_prediction_jsonl,
    )
    from nlp_series_relation_extraction_ray.sources.transcripts import (
        transcripts_dataset,
        turn_text,
    )

    triples = extract_triples(transcripts_dataset(30), head="mpn")
    path = str(tmp_path / "pred.jsonl")
    n = write_prediction_jsonl(triples, path)
    lines = open(path, encoding="utf-8").read().splitlines()
    assert len(lines) == n > 0
    row = json.loads(lines[0])
    assert set(row) == {"text", "spo_list"}
    # DuIE shape: object is a dict with @value
    assert "@value" in row["spo_list"][0]["object"]
    # text must be the (normalized) turn text
    assert isinstance(row["text"], str) and row["text"]
    # no ascii escaping (CJK survives raw)
    assert any(ord(c) > 127 for c in lines[0])


def test_train_explosion():
    from nlp_series_relation_extraction_ray.stages.train_explode import (
        explode_per_subject,
    )
    from nlp_series_relation_extraction_ray.sources.transcripts import (
        conv_id,
        fact_for,
        n_turns,
        turn_text,
    )

    rows = {"conv_id": [], "turn_idx": [], "text": []}
    expected_subjects = 0
    for i in range(12):
        for j in range(n_turns(i)):
            rows["conv_id"].append(conv_id(i))
            rows["turn_idx"].append(j)
            rows["text"].append(turn_text(i, j))
            spo = fact_for(i, j)
            if spo:
                # one subject span per simple fact; N-ary facts add one
                # pseudo-subject per affiliated slot (the @value object)
                n_affi = sum(1 for k in spo["object"] if k != "@value")
                expected_subjects += 1 + (1 if n_affi else 0)
    batch = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "text": pa.array(rows["text"], pa.string()),
        }
    )
    out = explode_per_subject(batch)
    assert out.num_rows == expected_subjects
    po0 = json.loads(out["po_json"][0].as_py())
    assert all(len(t) == 3 for t in po0)  # (o_start, o_end, predicate_id)


def test_custom_head_registration():
    from nlp_series_relation_extraction_ray.stages.base import (
        get_head,
        register_head,
    )

    @register_head
    class NullHead:
        name = "null-test"
        normalizes_text = False

        def preprocess(self, text):
            return {"context": text}

        def oracle_scores(self, ex, spo_list):
            return None

        def decode(self, ex, scores):
            return [], []

    h = get_head("null-test")
    assert h.decode(h.preprocess("x"), None) == ([], [])


def test_duie_jsonl_sink_batch_split_safe(ray_session, tmp_path):
    """A turn whose triples straddle batch boundaries must still produce one
    JSONL line (the sink groups by turn before assembling)."""
    import ray

    from nlp_series_relation_extraction_ray.pipelines.extract import (
        extract_triples,
    )
    from nlp_series_relation_extraction_ray.sources.sinks import (
        write_prediction_jsonl,
    )
    from nlp_series_relation_extraction_ray.sources.transcripts import (
        transcripts_dataset,
    )

    triples = extract_triples(transcripts_dataset(40), head="baseline")
    # force pathological batching: checkpoint then re-read as 1-row blocks
    ckpt = str(tmp_path / "trip")
    triples.write_parquet(ckpt)
    reread = ray.data.read_parquet(ckpt, override_num_blocks=16)
    path = str(tmp_path / "pred.jsonl")
    n = write_prediction_jsonl(reread, path)
    lines = open(path, encoding="utf-8").read().splitlines()
    keys = [json.loads(l)["text"] for l in lines]
    assert len(lines) == n
    # one line per turn: no duplicate turn entries
    import collections

    raw = triples.to_pandas()
    n_turns_with_triples = raw.groupby(["conv_id", "turn_idx"]).ngroups
    assert n == n_turns_with_triples
