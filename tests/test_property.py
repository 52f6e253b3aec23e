"""Property-based parity: random dictionaries + token streams.

The oracle (readable transcription of the reference C++) and the compiled
fast path (int-interned automaton used on executors) must agree on EVERY
input — including adversarial ones hypothesis finds: shared prefixes,
overlapping candidates, case collisions, stopword interactions, separators,
equal-score ties (the strict-improvement first-wins rule).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from autoner_spark.dictionary import DictionarySpec, build_trie
from autoner_spark.oracle import segment_dp, tag_turn
from autoner_spark.tagger import compile_trie, tag_tokens_compiled

# small closed alphabet maximizes collisions (shared prefixes, case forms)
WORDS = ["a", "A", "ab", "AB", "Ab", "b", "bc", "c", "the", "-", ",", "x y"]
TOKENS = ["a", "A", "ab", "AB", "Ab", "b", "bc", "c", "the", "-", ",", "zz"]

types_st = st.sampled_from(
    ["T1", "T2", "PER", "ORG", "T1,T2", "Chemical,Disease"]
)
surface_st = st.lists(
    st.sampled_from([w for w in WORDS if " " not in w]), min_size=1, max_size=3
).map(" ".join)

dict_st = st.builds(
    DictionarySpec,
    core=st.lists(st.tuples(types_st, surface_st), max_size=8),
    full=st.lists(surface_st, max_size=6),
    stopwords=st.lists(st.sampled_from(["the", "a", "b"]), max_size=2),
)

turn_st = st.lists(st.sampled_from(TOKENS), max_size=12)


@settings(max_examples=300, deadline=None)
@given(spec=dict_st, tokens=turn_st)
def test_fast_path_equals_oracle(spec, tokens):
    trie = build_trie(spec)
    compiled = compile_trie(trie)
    fast = tag_tokens_compiled(tokens, compiled)
    slow = [
        (m.begin_tok, m.end_tok, m.surface, m.entity_type)
        for m in tag_turn(tokens, trie)
    ]
    assert fast == slow


@settings(max_examples=150, deadline=None)
@given(spec=dict_st, tokens=turn_st)
def test_segments_cover_stream_contiguously(spec, tokens):
    """segmentDP's traceback yields contiguous segments covering [0, n)
    exactly (string_match.h:59-86)."""
    trie = build_trie(spec)
    stream = tokens + ["\n"]
    segs = segment_dp(stream, trie)
    pos = 0
    for s in segs:
        assert s.l == pos and s.r > s.l
        pos = s.r
    assert pos == len(stream)


@settings(max_examples=150, deadline=None)
@given(spec=dict_st, tokens=turn_st)
def test_mentions_within_bounds_and_typed(spec, tokens):
    trie = build_trie(spec)
    for m in tag_turn(tokens, trie):
        assert 0 <= m.begin_tok < m.end_tok <= len(tokens)
        assert m.entity_type and m.entity_type != "__FILTERED__"
        assert m.surface == " ".join(tokens[m.begin_tok : m.end_tok])


# ---------------------------------------------------------------------------
# char-class tokenizer invariants (utils.h:195-247 semantics)
# ---------------------------------------------------------------------------

from autoner_spark.textutil import (  # noqa: E402
    ascii_lower,
    is_real_separator,
    is_separator_char,
    is_separator_token,
    simple_tokenize,
    simple_tokenize_non_sep,
)

text_st = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019/.,-()!?~@#$%^&*[] \t\n\v\f\r")
    ),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(s=text_st)
def test_simple_tokenize_invariants(s):
    toks = simple_tokenize(s)
    # length-preserving (the reference asserts this, utils.h:216-228)
    assert "".join(toks) == s
    for t in toks:
        assert t != ""
        if len(t) == 1 and is_separator_char(t):
            continue  # separator chars are their own tokens
        # non-separator tokens contain no separator chars
        assert not any(is_separator_char(c) for c in t)


@settings(max_examples=300, deadline=None)
@given(s=text_st)
def test_non_sep_is_filtered_lowered_projection(s):
    toks = simple_tokenize(s)
    want = [
        ascii_lower(t)
        for t in toks
        if not (is_separator_token(t) and not is_real_separator(t))
    ]
    assert simple_tokenize_non_sep(s) == want
    kept = [
        t for t in toks
        if not (is_separator_token(t) and not is_real_separator(t))
    ]
    assert simple_tokenize_non_sep(s, keep_capital=True) == kept
