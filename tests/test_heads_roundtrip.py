"""Label→decode round-trip tests for all four heads (no Ray needed).

The reference pins correctness via end-to-end eval against golden dev
annotations (SURVEY §5); with weights unavailable, the deterministic
equivalent is: build label tensors from gold spo via the reference's label
builders, feed them as perfect logits, decode, and require exact-match P/R=1
(SURVEY §7.0).
"""

import json

import pytest

from nlp_series_relation_extraction_ray.functions.evaluation import (
    calculate_metric,
    prf,
)
from nlp_series_relation_extraction_ray.sources import transcripts as t
from nlp_series_relation_extraction_ray.stages import get_head, head_names

HEADS = ["baseline", "mpn", "mhs", "biaffine", "baseline_wp"]


def run_head(head_name, text, gold):
    h = get_head(head_name)
    ex = h.preprocess(text)
    scores = h.oracle_scores(ex, gold)
    return h.decode(ex, scores)


def test_head_registry():
    assert head_names() == sorted(HEADS)


@pytest.mark.parametrize("head", HEADS)
def test_simple_fact_roundtrip(head):
    gold = [{
        "predicate": "作者", "subject": "青铜时代纪", "subject_type": "图书作品",
        "object": {"@value": "周明远"}, "object_type": {"@value": "人物"},
    }]
    text = "《青铜时代纪》是周明远写的长篇小说。"
    ents, spos = run_head(head, text, gold)
    assert calculate_metric(gold, spos) == (1, 0, 0)
    assert "青铜时代纪" in ents
    if head != "mpn":
        # MPN's entity list carries decoded subjects only
        # (run_evaluation.py:52-53); the other heads also surface objects
        assert "周明远" in ents


@pytest.mark.parametrize("head", HEADS)
def test_complex_nary_roundtrip(head):
    gold = [{
        "predicate": "获奖", "subject": "林晚晴", "subject_type": "娱乐人物",
        "object": {"@value": "金桅奖", "inWork": "星河彼岸",
                   "onDate": "2008年1月5日", "period": "10"},
        "object_type": {"@value": "奖项", "inWork": "作品",
                        "onDate": "Date", "period": "Number"},
    }]
    text = "林晚晴凭借《星河彼岸》于2008年1月5日获得第10届金桅奖。"
    ents, spos = run_head(head, text, gold)
    assert calculate_metric(gold, spos) == (1, 0, 0)
    spo = spos[0]
    assert spo["object"]["inWork"] == "星河彼岸"
    assert spo["object"]["period"] == "10"
    assert spo["object_type"]["onDate"] == "Date"


@pytest.mark.parametrize("head", HEADS)
def test_multiple_spo_per_turn(head):
    gold = [
        {"predicate": "导演", "subject": "暗夜行者", "subject_type": "影视作品",
         "object": {"@value": "陈思哲"}, "object_type": {"@value": "人物"}},
        {"predicate": "主演", "subject": "暗夜行者", "subject_type": "影视作品",
         "object": {"@value": "吴雅婷"}, "object_type": {"@value": "人物"}},
    ]
    text = "电影《暗夜行者》的导演是陈思哲，由吴雅婷领衔主演。"
    ents, spos = run_head(head, text, gold)
    tp, fp, fn = calculate_metric(gold, spos)
    assert tp == 2 and fn == 0
    assert prf(tp, fp, fn)["f1"] == 1.0


@pytest.mark.parametrize("head", HEADS)
def test_overlapping_surface_forms(head):
    # subject contains the object as a prefix: longest-first labeling must
    # keep both recoverable (dataset_baseline.py:93-96 comment)
    gold = [{
        "predicate": "创始人", "subject": "宏宇集团", "subject_type": "企业",
        "object": {"@value": "宏宇"}, "object_type": {"@value": "人物"},
    }]
    text = "宏宇集团的创始人是宏宇本人。"
    ents, spos = run_head(head, text, gold)
    tp, fp, fn = calculate_metric(gold, spos)
    assert tp == 1 and fn == 0


def test_baseline_cartesian_decode():
    # two subjects sharing one predicate with two objects -> baseline emits
    # the cartesian product (utils/utils.py:221-229): 2 gold + 2 spurious
    gold = [
        {"predicate": "妻子", "subject": "周明远", "subject_type": "人物",
         "object": {"@value": "林晚晴"}, "object_type": {"@value": "人物"}},
        {"predicate": "妻子", "subject": "郑浩然", "subject_type": "人物",
         "object": {"@value": "吴雅婷"}, "object_type": {"@value": "人物"}},
    ]
    text = "周明远的妻子是林晚晴；郑浩然的妻子是吴雅婷。"
    ents, spos = run_head("baseline", text, gold)
    tp, fp, fn = calculate_metric(gold, spos)
    assert tp == 2 and fn == 0
    assert fp == 2  # cartesian cross-pairs — faithful reference semantics


@pytest.mark.parametrize("head", ["mpn", "mhs", "biaffine"])
def test_normalizer_strips_noise(head):
    gold = [{
        "predicate": "歌手", "subject": "月光倒影", "subject_type": "歌曲",
        "object": {"@value": "梁素云"}, "object_type": {"@value": "人物"},
    }]
    text = "歌曲《月光倒影》®由梁素云◆演唱。"
    ents, spos = run_head(head, text, gold)
    assert calculate_metric(gold, spos) == (1, 0, 0)


@pytest.mark.parametrize("head", HEADS)
def test_fixture_corpus_exact(head):
    tp_ = fp_ = fn_ = 0
    for i in range(120):
        for j in range(t.n_turns(i)):
            spo = t.fact_for(i, j)
            gold = [spo] if spo else []
            ents, spos = run_head(head, t.turn_text(i, j), gold)
            tp, fp, fn = calculate_metric(gold, spos)
            tp_, fp_, fn_ = tp_ + tp, fp_ + fp, fn_ + fn
    m = prf(tp_, fp_, fn_)
    assert m["precision"] == 1.0 and m["recall"] == 1.0


def test_heads_agree_on_fixture_corpus():
    """All heads (incl. the WordPiece baseline) emit the same triple set on
    clean fixtures."""
    def key(spo):
        return (spo["predicate"], spo["subject"],
                json.dumps(spo["object"], sort_keys=True, ensure_ascii=False))

    for i in range(40):
        for j in range(t.n_turns(i)):
            spo = t.fact_for(i, j)
            gold = [spo] if spo else []
            text = t.turn_text(i, j)
            results = [
                {key(s) for s in run_head(h, text, gold)[1]} for h in HEADS
            ]
            assert all(r == results[0] for r in results)


def test_determinism():
    for head in HEADS:
        a = run_head(head, t.turn_text(7, 2), [t.fact_for(7, 2)])
        b = run_head(head, t.turn_text(7, 2), [t.fact_for(7, 2)])
        assert a == b


def test_wordpiece_head_actually_splits_subwords():
    """baseline_wp must exercise BOTH WordPiece branches (kept-whole runs
    and ##-chained char splits) and keep whole-piece char spans."""
    h = get_head("baseline_wp")
    toks = h.tokenizer.tokenize("2012")
    assert len(toks) > 1 and toks[1].startswith("##")
    assert any(
        len(w.lstrip("#")) > 1 and not w.startswith("[")
        for w in h.tokenizer.vocab
    )
    ex = h.preprocess("《星河彼岸》于2005年11月23日在临江市正式上映。")
    # multi-subtoken piece: consecutive tokens share one char span
    spans = ex["offset_mapping"]
    assert any(spans[i] == spans[i + 1] and spans[i] != (0, 0)
               for i in range(len(spans) - 1))
