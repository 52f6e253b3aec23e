from autoner_spark.dictionary import DictionarySpec, build_trie
from autoner_spark.oracle import (
    extract_mentions,
    get_boundary,
    get_types,
    segment_dp,
    tag_turn,
    to_bioes,
    to_ck,
)


def trie_basic():
    return build_trie(
        DictionarySpec(
            core=[
                ("Operator", "hash join"),
                ("Operator", "shuffle"),
                ("Operator", "scan"),
                ("Operator", "scan filter"),
                ("Object,Operator", "stream"),
            ],
            full=["fast scan", "window", "hash join"],
            stopwords=["the"],
        )
    )


def spans(tokens, trie):
    return {(m.begin_tok, m.end_tok, m.entity_type) for m in tag_turn(tokens, trie)}


def test_no_hits_all_break():
    trie = trie_basic()
    toks = ["alpha", "beta", "gamma"]
    assert spans(toks, trie) == set()
    segs = segment_dp(toks + ["\n"], trie)
    assert all(s.type == "" for s in segs)
    assert get_boundary(toks + ["\n"], segs)[:3] == [1, 1, 1]


def test_whole_turn_entity():
    trie = trie_basic()
    assert spans(["hash", "join"], trie) == {(0, 2, "Operator")}


def test_longer_span_preferred_quadratic():
    # "scan" (1 tok, score 1) vs "scan filter" (2 tok, score 4): DP picks
    # the longer span (string_match.h:45).
    trie = trie_basic()
    assert spans(["scan", "filter"], trie) == {(0, 2, "Operator")}


def test_overlap_resolution():
    # "fast scan filter": full-dict "fast scan" scores f[2]=4 (weight*2^2);
    # core "scan filter" from the skip state f[1]=0 sets f[3]=4 at i=1 while
    # f[3] is still -1; i=2's skip (f[2]=4 > f[3]=4) then fails the STRICT
    # test (string_match.h:28), so the entity segmentation sticks.
    trie = trie_basic()
    toks = ["fast", "scan", "filter"]
    assert spans(toks, trie) == {(1, 3, "Operator")}
    segs = segment_dp(toks + ["\n"], trie)
    assert [(s.l, s.r, s.type) for s in segs][:2] == [
        (0, 1, ""),
        (1, 3, "Operator"),
    ]


def test_filtered_span_no_mention_boundary_unknown():
    trie = trie_basic()
    toks = ["fast", "scan", "alpha"]
    assert spans(toks, trie) == set()
    segs = segment_dp(toks + ["\n"], trie)
    b = get_boundary(toks + ["\n"], segs)
    # FILTERED [0,2): positions 0,1 unknown, and one-past-end position 2
    # also zeroed (annotation.h:278 quirk) — "alpha" is skip-typed (no write)
    # so it STAYS 0.
    assert b[0] == 0 and b[1] == 0 and b[2] == 0


def test_filtered_then_entity_overwrites_boundary():
    trie = trie_basic()
    toks = ["fast", "scan", "shuffle"]
    segs = segment_dp(toks + ["\n"], trie)
    b = get_boundary(toks + ["\n"], segs)
    assert b[2] == 1  # entity Break overwrites the filtered one-past-end 0
    assert spans(toks, trie) == {(2, 3, "Operator")}


def test_multi_type_comma_joined_sorted():
    trie = trie_basic()
    assert spans(["stream"], trie) == {(0, 1, "Object,Operator")}


def test_matches_never_cross_turn_boundary():
    trie = trie_basic()
    # Within one token stream, "\n" blocks the walk (string_match.h:35-37)
    toks = ["hash", "\n", "join"]
    assert {(m.begin_tok, m.end_tok) for m in extract_mentions(toks, segment_dp(toks, trie))} == set()


def test_empty_and_separator_only_turns():
    trie = trie_basic()
    assert spans([], trie) == set()
    assert spans([",", ".", "("], trie) == set()


def test_separator_single_char_entity_skipped():
    # a single-char separator surface in the core dict is matched by DP but
    # skipped by boundary/type serialization (annotation.h:272-274)
    trie = build_trie(DictionarySpec(core=[("Punct", "-")]))
    assert spans(["-"], trie) == set()
    toks = ["-", "\n"]
    segs = segment_dp(toks, trie)
    assert segs[0].type == "Punct"  # DP matched it...
    assert get_types(toks, segs)[0] == "None"  # ...but serialization skips


def test_to_ck_format():
    trie = trie_basic()
    toks = ["hash", "join", "alpha", "\n", "fast", "scan", "\n"]
    ck = to_ck(toks, segment_dp(toks, trie))
    assert ck.splitlines() == [
        "<s> O None S",
        "hash I Operator S",
        "join O Operator S",
        "alpha I None S",
        "<eof> I None S",
        # the "\n" sentinel token printed via `sout << "\n" << endl`
        # (annotation.h:331) yields TWO empty lines — verified byte-for-byte
        # against the compiled reference binary.
        "",
        "",
        "<s> O None S",
        "fast O None D",
        "scan O None D",
        "<eof> I None S",
        "",
        "",
    ]


def test_to_bioes_format():
    trie = trie_basic()
    toks = ["hash", "join", "alpha", "\n", "fast", "scan", "\n",
            "scan", "filter", "shuffle", "\n"]
    out = to_bioes(toks, segment_dp(toks, trie))
    assert out.splitlines() == [
        "hash B-Operator",
        "join E-Operator",
        "alpha  O",          # leading-space quirk (annotation.h:372)
        "",
        "fast B-Chemical,I-Chemical,E-Chemical,S-Chemical,"
        "B-Disease,I-Disease,E-Disease,S-Disease,O",
        "scan B-Chemical,I-Chemical,E-Chemical,S-Chemical,"
        "B-Disease,I-Disease,E-Disease,S-Disease,O",
        "",
        "scan B-Operator",
        "filter E-Operator",
        "shuffle S-Operator",
        "",
    ]


def test_case_variants():
    trie = trie_basic()
    assert spans(["HASH", "JOIN"], trie) == {(0, 2, "Operator")}
    assert spans(["Hash", "Join"], trie) == set()  # capitalized form absent


def test_stopword_removed_unigram():
    trie = build_trie(
        DictionarySpec(core=[("Object", "the")], stopwords=["the"])
    )
    assert spans(["the"], trie) == set()


def test_tie_skip_vs_unigram_match():
    # 1-token entity: skip gives f[i+1]=f[i] (score +0), entity gives +1;
    # entity strictly greater -> always wins over skip.
    trie = trie_basic()
    assert spans(["shuffle"], trie) == {(0, 1, "Operator")}


def test_surface_is_space_joined():
    trie = trie_basic()
    m = tag_turn(["hash", "join"], trie)[0]
    assert m.surface == "hash join"
