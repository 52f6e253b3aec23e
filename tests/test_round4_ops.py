"""Semantics pins for the round-4 operator wave (beyond the DuckDB gate):
funnel ordering, bloom one-sidedness, BM25 monotonicity, chunk coverage,
PageRank invariants, CMS guarantee, SCD2 interval chaining, triangle
counts on a known graph, ER symmetry-free blocking, weighted sampling
bias."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from autoner_spark.caching import release_caches

    release_caches()


def test_funnel_stages_are_ordered(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_event_funnel"](spark, SF).collect()
    assert rows, "funnel empty on fixture"
    for r in rows:
        assert r.stage in (1, 2, 3)
        if r.stage >= 2:
            assert r.click_gap_sec is not None and r.click_gap_sec >= 0
        if r.stage == 3:
            assert r.purchase_gap_sec is not None and r.purchase_gap_sec >= 0
        if r.stage < 3:
            assert r.purchase_gap_sec is None


def test_bloom_is_one_sided(spark):
    # a bloom filter can false-positive but never false-negative:
    # n_pass >= n_true, and occupancy is bounded by k * n_keys
    from autoner_spark.queries import QUERIES

    r = QUERIES["rel_bloom_semijoin"](spark, SF).collect()[0]
    assert r.n_pass >= r.n_true
    assert r.n_false_positives == r.n_pass - r.n_true
    assert 0 < r.n_occupied <= 8192


def test_bm25_more_matched_terms_scores_higher_at_equal_tf(spark):
    # a doc matching all 3 query terms must outrank a doc matching 1 term
    # once per identical length — pin with a synthetic corpus
    from autoner_spark import queries as Q

    df = spark.createDataFrame(
        [(0, "join scan filter x y z"), (1, "join a b c d e"),
         (2, "a b c d e f")] + [(i, "w x y z u v") for i in range(3, 40)],
        "doc_id long, text string",
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r.score
               for r in Q.QUERIES["text_bm25_topk"](spark, td).collect()}
    assert set(out) == {0, 1}  # only term-matching docs score
    assert out[0] > out[1]


def test_chunks_cover_document_exactly(spark):
    # stride-24/window-32 chunks: first 24 tokens of each chunk
    # concatenated (plus the final chunk's tail) reconstruct the doc
    from autoner_spark.queries import QUERIES, load

    chunks = QUERIES["text_chunk_overlap"](spark, SF)
    docs = {r.doc_id: r.text for r in load(spark, SF, "documents").collect()}
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        toks = docs[doc_id].split(" ")
        rebuilt = []
        for r in rs[:-1]:
            assert r.n_tokens == min(32, len(toks) - r.chunk_idx * 24)
            rebuilt.extend(r.chunk_text.split(" ")[:24])
        rebuilt.extend(rs[-1].chunk_text.split(" "))
        assert rebuilt == toks


def test_pagerank_mass_and_uniform_on_symmetric_graph(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["kg_pagerank"](spark, SF).collect()
    assert rows
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-3  # rank mass conserved (no dangling)
    # complete-graph symmetry: nodes with equal degree get equal rank
    by_deg = {}
    for r in rows:
        by_deg.setdefault(r.deg, set()).add(r.rank)
    for deg, ranks in by_deg.items():
        assert max(ranks) - min(ranks) < 1e-5, (deg, ranks)


def test_cms_estimate_never_undercounts(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_cms_heavy_hitters"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact
        assert r.overshoot == r.cms_est - r.exact


def test_scd2_intervals_chain_per_key(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_scd2_merge"](spark, SF).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    changed = 0
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r.valid_from_us)
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current == 1 and rs[-1].valid_to_us == -1
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us  # no gaps, no overlaps
        if len(rs) == 2:
            changed += 1
            assert rs[1].status == "R"
            assert key % 7 == 0
    assert changed > 0


def test_triangles_on_known_graph(spark, monkeypatch):
    # 4-clique + pendant edge: the clique's 4 nodes are each in C(3,2)=3
    # triangles; the pendant node in none (absent from output).
    from autoner_spark import queries as Q

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e")]
    fake = spark.createDataFrame(edges, "surface_a string, surface_b string")
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: fake)
    out = {r.node: r.n_triangles
           for r in Q.q_kg_triangles(spark, SF).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_entity_resolution_requires_shared_token(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["kg_entity_resolution"](spark, SF).collect()
    for r in rows:
        assert r.surface_a < r.surface_b  # canonical orientation, no dups
        assert set(r.surface_a.split()) & set(r.surface_b.split())
        assert r.dist <= 6


def test_inverted_index_counts_consistent(spark):
    from autoner_spark.queries import QUERIES, load

    idx = {r.term: r for r in
           QUERIES["text_inverted_index"](spark, SF).collect()}
    docs = [(r.doc_id, r.text.split(" "))
            for r in load(spark, SF, "documents").collect()]
    # recount one mid-frequency term by hand
    term = sorted(idx, key=lambda t: idx[t].df)[len(idx) // 2]
    df = sum(1 for _, toks in docs if term in toks)
    tf = sum(toks.count(term) for _, toks in docs)
    assert idx[term].df == df and idx[term].total_tf == tf
    heads = idx[term].postings_head.split(",")
    assert len(heads) == min(16, df)
    assert heads == sorted(heads, key=int)


def test_label_propagation_separates_disjoint_cliques(spark, monkeypatch):
    # two DISJOINT 3-cliques: after 2 deterministic min-tie-break rounds
    # each clique converges to its own minimum member's label. (A bridge
    # edge would let the lexicographically smaller clique's labels invade
    # — correct LPA-with-min-tie-break behavior, not separation.)
    from autoner_spark import queries as Q

    edges = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
             ("b1", "b2"), ("b1", "b3"), ("b2", "b3")]
    fake = spark.createDataFrame(edges, "surface_a string, surface_b string")
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: fake)
    out = {r.node: r.label
           for r in Q.q_kg_label_propagation(spark, SF).collect()}
    assert out == {"a1": "a1", "a2": "a1", "a3": "a1",
                   "b1": "b1", "b2": "b1", "b3": "b1"}


def test_rolling_spend_frames(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_rolling_spend"](spark, SF).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r.order_seq)
        assert [r.order_seq for r in rs] == list(range(1, len(rs) + 1))
        # cumulative sum is monotone in nonnegative spend and the first
        # row's trailing average equals its own spend
        assert rs[0].trailing3_avg_cents == rs[0].cum_cents
        for a, b in zip(rs, rs[1:]):
            assert b.cum_cents >= a.cum_cents


def test_rolling_spend_half_cent_frame_is_integer_exact(spark, tmp_path):
    # the r04 red-row class: a count=2 frame whose cents sum is ODD has an
    # exact half-cent average (26855997 / 2 = 13427998.5) — the integer
    # HALF_UP form must emit 13427999 deterministically, never an
    # engine-dependent .98/.99 double round
    from autoner_spark.queries import QUERIES

    spark.createDataFrame(
        [(1, 10, "1995-01-01", 134279.99),
         (1, 20, "1995-02-01", 134279.98)],
        "o_custkey long, o_orderkey long, o_orderdate string,"
        " o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")) \
        .write.parquet(f"{tmp_path}/orders.parquet")
    rows = sorted(
        QUERIES["rel_rolling_spend"](spark, str(tmp_path)).collect(),
        key=lambda r: r.order_seq,
    )
    assert rows[0].trailing3_avg_cents == 13427999
    assert rows[1].cum_cents == 13427999 + 13427998
    assert rows[1].trailing3_avg_cents == 13427999  # HALF_UP on .5


def test_hopping_windows_double_count_exactly(spark):
    # win=2*hop: every event lands in exactly 2 windows, so total
    # windowed event mass is exactly 2x the raw count
    from autoner_spark.queries import QUERIES, load

    raw = load(spark, SF, "events").count()
    agg = QUERIES["rel_events_hopping"](spark, SF)
    assert agg.agg(F.sum("n_events")).collect()[0][0] == 2 * raw
    # window starts are hop-aligned
    assert agg.filter(F.col("window_start_us") % 300000000 != 0).count() == 0


def test_unigram_surprisal_uniform_corpus_is_ln_vocab(spark):
    # every doc drawn uniformly from a 4-word vocab -> per-token logp =
    # ln(1/4) exactly, so every doc's mean surprisal is ln(4)
    import math
    import os
    import tempfile

    from autoner_spark import queries as Q

    docs = [(i, " ".join("abcd"[(i + j) % 4] for j in range(8)))
            for i in range(16)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = Q.QUERIES["text_unigram_surprisal"](spark, td).collect()
    assert len(out) == 16
    for r in out:
        assert r.n_tokens == 8
        assert abs(r.surprisal_nats - math.log(4)) < 1e-5


def test_prefix_jaccard_equals_plain_jaccard(spark):
    # the AllPairs prefix filter must be lossless: identical pair set and
    # jaccard values as the reference formulation, on the corpus fixture
    # AND at a permissive threshold where prefixes get long
    from autoner_spark.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )
    from autoner_spark.queries import load

    docs = load(spark, SF, "documents")
    # 0.07 regression-pins the FP prefix bound: 0.07*100 = 7.000...001 in
    # doubles, so a naive ceil() would over-prune (review finding)
    for t in (0.5, 0.2, 0.07):
        plain = {(r.id_a, r.id_b): r.jaccard
                 for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
        pref = {(r.id_a, r.id_b): r.jaccard
                for r in ngram_jaccard_prefix_pairs(
                    docs, threshold=t).collect()}
        assert pref == plain and plain


def test_weighted_sample_prefers_longer_docs(spark):
    # ES sampling: expected inclusion prob ∝ weight. With one doc 50x
    # heavier than the rest, it must land in the top-20 of 200.
    from autoner_spark import queries as Q

    docs = [(i, "w " * 9 + "w") for i in range(199)]  # 10 tokens each
    docs.append((199, "w " * 499 + "w"))  # 500 tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        picked = {r.doc_id
                  for r in Q.QUERIES["text_weighted_sample"](spark, td).collect()}
    assert len(picked) == 20
    assert 199 in picked
