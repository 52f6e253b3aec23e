from autoner_spark.dictionary import DictionarySpec, TrieKB, build_trie
from autoner_spark.textutil import FILTERED_TYPE


def walk(trie: TrieKB, tokens: list[str]) -> int:
    u = 0
    for t in tokens:
        u = trie.get_child(u, t)
        if u == -1:
            return -1
    return u


def test_insert_three_case_forms():
    # annotation.h:99-138: raw + ALL-UPPER always, all-lower unless noLowercases
    spec = DictionarySpec(core=[("Chemical", "NaCl salt")])
    trie = build_trie(spec)
    assert trie.is_entity(walk(trie, ["NaCl", "salt"]))
    assert trie.is_entity(walk(trie, ["NACL", "SALT"]))
    assert trie.is_entity(walk(trie, ["nacl", "salt"]))
    assert walk(trie, ["Nacl", "Salt"]) == -1  # capitalized form never inserted


def test_per_org_loc_no_lowercase():
    # annotation.h:195: type containing PER/ORG/LOC -> no lowercase form
    spec = DictionarySpec(core=[("ORG", "Spark Foundation"), ("PER", "Ada Lovelace")])
    trie = build_trie(spec)
    assert trie.is_entity(walk(trie, ["Spark", "Foundation"]))
    assert trie.is_entity(walk(trie, ["SPARK", "FOUNDATION"]))
    assert walk(trie, ["spark", "foundation"]) == -1
    assert walk(trie, ["ada", "lovelace"]) == -1


def test_stopword_check_runs_against_empty_set():
    # annotation.h:235-243 ordering quirk: cleanStopwords runs AFTER the core
    # load, so a stopword-containing surface still gets its lowercase form.
    spec = DictionarySpec(core=[("Object", "The Vector")], stopwords=["the"])
    trie = build_trie(spec)
    assert trie.is_entity(walk(trie, ["the", "vector"]))  # lowercase inserted


def test_stopword_cleanup_removes_three_unigram_forms():
    # annotation.h:220-233
    spec = DictionarySpec(
        core=[("Chemical", "the"), ("Chemical", "THE"), ("Chemical", "The")],
        stopwords=["the"],
    )
    trie = build_trie(spec)
    for form in (["the"], ["THE"], ["The"]):
        u = walk(trie, form)
        assert u != -1 and not trie.is_entity(u)  # types cleared, node remains


def test_full_dict_only_marks_untyped_nodes():
    # annotation.h:63,78,93: FILTERED only if node has no types yet
    spec = DictionarySpec(core=[("Operator", "hash join")], full=["hash join", "fast scan"])
    trie = build_trie(spec)
    u = walk(trie, ["hash", "join"])
    assert trie.is_entity(u) and trie.get_types(u) == frozenset({"Operator"})
    v = walk(trie, ["fast", "scan"])
    assert trie.is_filtered(v) and not trie.is_entity(v)


def test_last_core_line_flag_leaks_into_full_dict():
    # annotation.h:184,196,214: noLowercasesForThisKB keeps the LAST core
    # line's value when marking full-dict phrases.
    spec_per_last = DictionarySpec(
        core=[("Chemical", "NaCl"), ("PER", "Ada Lovelace")], full=["Fast Scan"]
    )
    trie = build_trie(spec_per_last)
    assert walk(trie, ["fast", "scan"]) == -1  # lowercase form suppressed

    spec_chem_last = DictionarySpec(
        core=[("PER", "Ada Lovelace"), ("Chemical", "NaCl")], full=["Fast Scan"]
    )
    trie = build_trie(spec_chem_last)
    assert trie.is_filtered(walk(trie, ["fast", "scan"]))  # lowercase marked


def test_multi_type_surface():
    spec = DictionarySpec(core=[("Object,Operator", "stream")])
    trie = build_trie(spec)
    u = walk(trie, ["stream"])
    assert trie.get_types(u) == frozenset({"Object", "Operator"})
    assert trie.get_type_from_kb(["stream"]) == "Object,Operator"


def test_shared_prefix_paths():
    spec = DictionarySpec(core=[("Operator", "scan"), ("Operator", "scan filter")])
    trie = build_trie(spec)
    assert trie.is_entity(walk(trie, ["scan"]))
    assert trie.is_entity(walk(trie, ["scan", "filter"]))
