"""Tokenizer alignment (M2/M3) and gold-span search (M4)."""

from nlp_series_relation_extraction_ray.tokenization import (
    convert_to_tokens,
    is_chinese_or_punct,
    search,
    search_spo_index,
    split_char_classes,
    tokenize_with_offset_mapping,
)


def test_char_classes():
    assert is_chinese_or_punct("中")
    assert is_chinese_or_punct("。")
    assert is_chinese_or_punct("《")
    assert is_chinese_or_punct("!")
    assert is_chinese_or_punct(" ")  # 0x20 is in the CN punct list
    assert not is_chinese_or_punct("a")
    assert not is_chinese_or_punct("7")
    assert not is_chinese_or_punct("\xa0")


def test_splitter_mixed_runs():
    # digit run / latin run boundaries per data_utils.py:68-96
    assert split_char_classes("abc123中") == ["abc", "123", "中"]
    assert split_char_classes("TGA90%~95%") == ["TGA", "90", "%", "~", "95", "%"]
    assert split_char_classes("《abc》") == ["《", "abc", "》"]
    assert split_char_classes("12.5亿") == ["12", ".", "5", "亿"]


def test_alignment_offsets():
    text = "《星河》2001年ab cd"
    tokens, starts, ends = convert_to_tokens(text)
    assert tokens == ["《", "星", "河", "》", "2001", "年", "ab", "cd"]
    # each token slices back to its own surface
    for tok, s, e in zip(tokens, starts, ends):
        assert text[s : e + 1].lower() == tok
    # space emits no token but advances offsets ("cd" starts after the space)
    assert text[starts[-1] :] == "cd"


def test_offset_mapping_with_specials():
    tokens, mapping = tokenize_with_offset_mapping("中a1")
    assert tokens == ["[CLS]", "中", "a", "1", "[SEP]"]
    assert mapping[0] == (0, 0) and mapping[-1] == (0, 0)
    assert mapping[1] == (0, 1) and mapping[2] == (1, 2)


def test_search():
    assert search(["b", "c"], ["a", "b", "c", "d"]) == 1
    assert search(["x"], ["a"]) == -1


def test_search_spo_longest_first_overlap():
    # "xyz established xyz corporation" situation: longer entity matched first,
    # shorter must fall outside the forbidden window (data_utils.py:114-161)
    tokens = list("甲乙丙公司由甲乙创立")
    s, o = search_spo_index(tokens, list("甲乙丙公司"), list("甲乙"))
    assert s == 0
    assert o == 6  # the second 甲乙, outside the forbidden window


def test_search_spo_object_longer():
    tokens = list("甲乙在甲乙丙公司工作")
    s, o = search_spo_index(tokens, list("甲乙"), list("甲乙丙公司"))
    assert o == 3
    assert s == 0
