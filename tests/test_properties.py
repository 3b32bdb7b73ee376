"""Property-based tests (hypothesis): tokenizer alignment and decode
round-trip invariants over randomized inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from nlp_series_relation_extraction_ray.tokenization import (
    convert_to_tokens,
    search,
    split_char_classes,
)

# mixed alphabet: CJK, latin, digits, CN/EN punctuation, space, noise chars
_ALPHABET = (
    "中文知识图谱抽取引擎测试数据《》。，！？"
    "abcXYZ0189 ._-®◆\xa0"
)
texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)


@given(texts)
@settings(max_examples=200, derandomize=True)
def test_splitter_covers_text(text):
    """Char-class splitting is a partition of the text (order-preserving)."""
    assert "".join(split_char_classes(text)) == text


@given(texts)
@settings(max_examples=200, derandomize=True)
def test_alignment_slices_back(text):
    """Every token's char span slices back to the token (mod lowercase)."""
    tokens, starts, ends = convert_to_tokens(text)
    for tok, s, e in zip(tokens, starts, ends):
        assert text[s : e + 1].lower() == tok
    # offsets are monotone non-decreasing
    assert starts == sorted(starts)
    assert all(e >= s for s, e in zip(starts, ends))


@given(texts)
@settings(max_examples=200, derandomize=True)
def test_space_tokens_dropped(text):
    """Space sub-texts emit no token; all non-space chars are covered."""
    tokens, starts, ends = convert_to_tokens(text)
    covered = sum(e - s + 1 for s, e in zip(starts, ends))
    non_space = len(text) - text.count(" ")
    assert covered == non_space


@given(st.lists(st.sampled_from("abc中文"), min_size=1, max_size=20),
       st.integers(min_value=0, max_value=15),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=200, derandomize=True)
def test_search_finds_own_slice(seq, start, length):
    """search(seq[i:i+n], seq) returns an index whose slice equals the
    pattern, and never an index later than i."""
    start = min(start, len(seq) - 1)
    pattern = seq[start : start + length]
    idx = search(pattern, seq)
    assert 0 <= idx <= start
    assert seq[idx : idx + len(pattern)] == pattern


@given(st.text(alphabet="甲乙丙丁戊", min_size=2, max_size=12))
@settings(max_examples=100, derandomize=True)
def test_oracle_roundtrip_random_entities(surface):
    """Any CJK surface planted in a template sentence survives the full
    label->decode round trip on every head."""
    from nlp_series_relation_extraction_ray.functions.evaluation import (
        calculate_metric,
    )
    from nlp_series_relation_extraction_ray.stages import get_head

    subject = surface
    obj = "周明远"
    if obj in subject:
        return  # overlap cases covered deterministically elsewhere
    gold = [{
        "predicate": "作者", "subject": subject, "subject_type": "图书作品",
        "object": {"@value": obj}, "object_type": {"@value": "人物"},
    }]
    text = f"《{subject}》是{obj}写的长篇小说。"
    for head in ("baseline", "mpn", "mhs", "biaffine"):
        h = get_head(head)
        ex = h.preprocess(text)
        sc = h.oracle_scores(ex, gold)
        _, spos = h.decode(ex, sc)
        tp, fp, fn = calculate_metric(gold, spos)
        assert tp == 1 and fn == 0, (head, text, spos)


# ---- WordPiece subword option (closes the documented divergence) ---------

_WP_CORPUS = [
    "spark engine merges tokens fast",
    "spark spark tokens merge merge engine",
    "数据 data42 engine 引擎 tokens2000",
]


def _wp():
    from nlp_series_relation_extraction_ray.tokenization import (
        WordPieceTokenizer,
        build_wordpiece_vocab,
    )

    return WordPieceTokenizer(build_wordpiece_vocab(_WP_CORPUS, min_freq=2))


def test_wordpiece_splits_unseen_compound():
    """A run made of a frequent word + unseen tail splits greedily into the
    word plus ## continuations (real subword behavior, not whole-run)."""
    tok = _wp()
    pieces = tok.tokenize("sparkly")
    assert pieces[0] == "spark"
    assert all(p.startswith("##") for p in pieces[1:])
    assert "spark" + "".join(p[2:] for p in pieces[1:]) == "sparkly"


def test_wordpiece_whole_word_kept():
    tok = _wp()
    assert tok.tokenize("spark") == ["spark"]
    assert tok.tokenize("中") == ["中"]  # CJK single chars pass through


@given(texts)
@settings(max_examples=200, derandomize=True)
def test_wordpiece_alignment_lossless(text):
    """With subword splitting ON: all sub-tokens of a piece share the
    piece's char span, and stripping ## and concatenating reconstructs the
    lowercased piece — the char-fallback guarantees losslessness."""
    tok = _wp()
    tokens, starts, ends = convert_to_tokens(text, tokenizer=tok)
    assert len(tokens) == len(starts) == len(ends)
    # group tokens by identical (start, end) span = one source piece
    by_span: dict = {}
    for t, s, e in zip(tokens, starts, ends):
        assert 0 <= s <= e < len(text)
        by_span.setdefault((s, e), []).append(t)
    for (s, e), toks in by_span.items():
        piece = text[s : e + 1].lower()
        rebuilt = toks[0] + "".join(t[2:] for t in toks[1:])
        assert rebuilt == piece


def test_wordpiece_span_search_consistent():
    """Gold-span search over subword tokens finds an entity tokenized with
    the same tokenizer (label builder / decoder consistency)."""
    from nlp_series_relation_extraction_ray.tokenization import (
        search_spo_index,
    )

    tok = _wp()
    text = "the sparkly engine merges tokens"
    tokens, _, _ = convert_to_tokens(text, tokenizer=tok)
    subj = tok.tokenize("sparkly")
    obj = tok.tokenize("tokens")
    si, oi = search_spo_index(tokens, subj, obj)
    assert si >= 0 and oi >= 0
    assert tokens[si : si + len(subj)] == subj
    assert tokens[oi : oi + len(obj)] == obj
