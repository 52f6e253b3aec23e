from autoner_spark.textutil import (
    ascii_lower,
    ascii_upper,
    capitalize_first,
    is_real_separator,
    is_separator_token,
    split_by,
    strip_ref,
    tokenize_turn,
)


def test_ascii_case_only_touches_ascii():
    assert ascii_upper("abcXYZ-1ü") == "ABCXYZ-1ü"
    assert ascii_lower("ABCxyz-1Ü") == "abcxyz-1Ü"


def test_capitalize_first_matches_reference():
    # annotation.h:229 — only first char upcased, rest untouched
    assert capitalize_first("naCl") == "NaCl"
    assert capitalize_first("") == ""


def test_strip_ref_quirk_keeps_one_char_of_all_space():
    # utils.h:109-119: loops stop at l < r
    assert strip_ref("  ") == " "
    assert strip_ref(" x ") == "x"
    assert strip_ref("x") == "x"
    assert strip_ref("") == ""
    assert strip_ref("\t ab \n") == "ab"


def test_split_by_drops_empty_fields():
    # utils.h:72-90
    assert split_by("a,,b,", ",") == ["a", "b"]
    assert split_by(",,,", ",") == []


def test_separators():
    # utils.h:161-183
    for ch in "/.,-()!?~@#$%^&*[]":
        assert is_separator_token(ch)
        assert not is_real_separator(ch)
    assert is_separator_token(" ") and is_separator_token("\t")
    assert is_separator_token("\n") and is_real_separator("\n")
    assert not is_separator_token("ab")
    assert not is_separator_token("x")


def test_tokenize_turn():
    assert tokenize_turn("a  b c") == ["a", "b", "c"]
    assert tokenize_turn("") == []
    assert " ".join(tokenize_turn("a b c")) == "a b c"
