"""Semantics pins for the round-5 operator wave (beyond the DuckDB gate):
PMI symmetry/marginals, common-neighbor wedge counts on a known graph,
k-core peeling on a known graph, turn-dedup retention, skyline staircase
dominance, cube grouping-set totals, cohort-retention invariants, TF-IDF
monotonicity, Zipf slope on an exact power law, range-search vs
brute-force agreement."""
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


def test_kcore_peels_chain_but_keeps_clique(spark, monkeypatch):
    # graph = triangle {a,b,c} + tail c-d-e. Bounded-round semantics
    # (2 rounds, as documented): round 1 peels e (deg 1); the second
    # degree pass drops d (deg 1 in the induced subgraph) and reports
    # surviving nodes' INDUCED degree after round 1 — so c still counts
    # its edge to the not-yet-removed d (core_deg 3). A fixpoint run
    # (one more identical round) would settle c at 2.
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    out = {r.node: r.core_deg for r in Q.q_kg_kcore(spark, SF).collect()}
    assert out == {"a": 2, "b": 2, "c": 3}
    assert "e" not in out and "d" not in out


def test_common_neighbors_wedge_counts(spark, monkeypatch):
    # star a-b, a-c, a-d: every leaf pair shares exactly neighbor a;
    # leaf degree 1 -> jaccard = 1/(1+1-1) = 1.0
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    rows = {(r.surface_a, r.surface_b): (r.n_common, r.nb_jaccard)
            for r in Q.q_kg_common_neighbors(spark, SF).collect()}
    assert rows[("b", "c")] == (1, 1.0)
    assert rows[("b", "d")] == (1, 1.0)
    assert rows[("c", "d")] == (1, 1.0)
    # a pairs with each leaf through the OTHER leaves' wedges: a-b share
    # {c,d}? no — N(a)={b,c,d}, N(b)={a}: disjoint -> (a,b) absent
    assert ("a", "b") not in rows


def test_entity_pmi_marginals(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["kg_entity_pmi"](spark, SF).collect()
    assert rows, "pmi empty on fixture"
    for r in rows:
        assert r.surface_a < r.surface_b
        assert r.n_ab >= 1
        assert r.pmi is not None
    # pmi is bounded above by -ln(max(p_a, p_b)) <= ln(N); spot sanity:
    # co-occurring pairs of frequent surfaces get small |pmi|
    assert all(abs(r.pmi) < 20 for r in rows)


def test_turn_dedup_keeps_first_occurrence(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    # conv-0 (docs 0..7) and conv-1 (docs 8..15, TURNS_PER_CONV=8): doc 9
    # repeats doc 1's text -> conv-1 keeps one fewer turn
    texts = [f"tok{i} filter stream" for i in range(16)]
    texts[9] = texts[1]
    spark.createDataFrame(
        [(i, t, "synth") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.conv_id: (r.n_turns, r.n_kept)
           for r in QUERIES["kg_turn_dedup"](spark, str(tmp_path)).collect()}
    assert out["conv-000000"] == (8, 8)
    assert out["conv-000001"] == (8, 7)


def test_skyline_is_undominated_staircase(spark):
    from autoner_spark.queries import QUERIES

    rows = sorted(QUERIES["rel_order_skyline"](spark, SF).collect(),
                  key=lambda r: r.day)
    assert rows
    # strictly increasing price along increasing day = no point dominates
    # another (earlier day always has strictly lower best price)
    for a, b in zip(rows, rows[1:]):
        assert a.day < b.day and a.best_cents < b.best_cents


def test_cube_grouping_sets_totals_are_consistent(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_cube_orders"](spark, SF).collect()
    total = [r for r in rows if r.g_status == 1 and r.g_priority == 1]
    assert len(total) == 1
    fine = [r for r in rows if r.g_status == 0 and r.g_priority == 0]
    by_status = [r for r in rows if r.g_status == 0 and r.g_priority == 1]
    assert sum(r.n_orders for r in fine) == total[0].n_orders
    assert sum(r.total_cents for r in by_status) == total[0].total_cents


def test_retention_day_zero_counts_every_user(spark):
    from autoner_spark.queries import QUERIES, load

    rows = QUERIES["rel_events_retention"](spark, SF).collect()
    n_users = (load(spark, SF, "events").select("user_id").distinct()
               .count())
    day0 = sum(r.n_users for r in rows if r.offset_days == 0)
    assert day0 == n_users           # every user is in their own cohort
    assert all(r.offset_days >= 0 for r in rows)


def test_tfidf_rarer_term_outranks_common_at_equal_tf(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    docs = [(0, "rare common filler"), (1, "common filler pad"),
            (2, "common filler pad"), (3, "common filler pad")]
    spark.createDataFrame(
        [(i, t, "s") for i, t in docs],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = [r for r in QUERIES["text_tfidf_topk"](spark, str(tmp_path))
            .collect() if r.doc_id == 0]
    rows.sort(key=lambda r: r.rnk)
    assert rows[0].term == "rare"    # df=1 beats df=4 at equal tf


def test_zipf_slope_exact_power_law(spark, tmp_path):
    # frequencies n_r = round(1000 / r) approximate slope -1; build the
    # corpus explicitly and check the fitted slope is near -1
    from autoner_spark.queries import QUERIES

    rows = []
    did = 0
    for r in range(1, 9):
        for _ in range(round(1000 / r)):
            rows.append((did, f"w{r:02d}", "s"))
            did += 1
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .write.parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["text_zipf_slope"](spark, str(tmp_path)).collect()[0]
    assert out.n_terms == 8
    assert math.isclose(out.zipf_slope, -1.0, abs_tol=0.05)


def test_range_search_agrees_with_brute_force(spark):
    from autoner_spark.queries import QUERIES, load

    got = {(r.vec_id, r.cosine)
           for r in QUERIES["sim_range_search"](spark, SF).collect()}
    # brute-force replay on the driver
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding)
            for r in load(spark, SF, "embeddings").collect()}
    q = vecs[0]
    expect = set()
    for vid, v in vecs.items():
        if vid == 0:
            continue
        c = round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6)
        if c >= 0.2:
            expect.add((vid, c))
    assert {v for v, _ in got} == {v for v, _ in expect}
    for (vid, c) in got:
        (exp_c,) = [e for v, e in expect if v == vid]
        assert abs(c - exp_c) <= 1e-6


def test_range_search_drops_zero_norm_vectors_on_both_engines(spark,
                                                              tmp_path):
    # 0/0 cosine is NaN in Spark (and NaN > any number in Spark's
    # ordering!) but NULL in DuckDB — both engines must drop the row
    import duckdb

    from autoner_spark.queries import ORACLE_SQL, QUERIES

    spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    rows = QUERIES["sim_range_search"](spark, str(tmp_path)).collect()
    assert {r.vec_id for r in rows} == {1}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    duck = con.execute(ORACLE_SQL["sim_range_search"]).fetchall()
    assert {r[1] for r in duck} == {1}


def test_triple_support_sums_to_has_type_count(spark):
    from autoner_spark.queries import QUERIES

    triples = QUERIES["kg_triples_exact"](spark, SF)
    n_has_type = triples.filter(F.col("pred") == "has_type").count()
    from autoner_spark.caching import release_caches

    release_caches()
    rows = QUERIES["kg_triple_support"](spark, SF).collect()
    assert sum(r.support for r in rows) == n_has_type
    for r in rows:
        assert 1 <= r.n_convs <= r.support


def test_substring_dedup_flags_shared_window_only(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    shared = "a b c d e f g h"            # exactly one 8-token window
    docs = [(0, shared + " x y z"),       # 4 windows, 1 shared
            (1, "p q " + shared),         # 3 windows, 1 shared
            (2, "u v w x y z q p a b")]   # 3 windows, none shared
    spark.createDataFrame(
        [(i, t, "s") for i, t in docs],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_fraction)
           for r in QUERIES["text_substring_dedup"](
               spark, str(tmp_path)).collect()}
    assert out[0] == (4, 1, 0.25)
    assert out[1] == (3, 1, round(1 / 3, 6))
    assert out[2] == (3, 0, 0.0)


def test_normalize_canonicalizes_messy_text(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    spark.createDataFrame(
        [(0, "Hello,   WORLD!! 42", "s"), (1, "hello world 42", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r.doc_id: r for r in QUERIES["text_normalize"](
        spark, str(tmp_path)).collect()}
    # both canonicalize to "hello world 42" -> identical fingerprints
    assert rows[0].norm_fingerprint == rows[1].norm_fingerprint
    assert rows[0].norm_len == len("hello world 42")


def test_normalize_non_ascii_agrees_across_engines(spark, tmp_path):
    # U+0130 ('I' with dot): Java's FULL case mapping lowers it to
    # 'i' + combining dot while DuckDB's simple mapping yields plain
    # 'i' — the ASCII pre-strip must run BEFORE lower() so both engines
    # see identical input (r05 review finding)
    import duckdb

    from autoner_spark.queries import ORACLE_SQL, QUERIES

    spark.createDataFrame(
        [(0, "tok İstanbul tok", "s"), (1, "tok stanbul tok", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    srows = sorted(
        tuple(r) for r in QUERIES["text_normalize"](
            spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    drows = sorted(tuple(r) for r in
                   con.execute(ORACLE_SQL["text_normalize"]).fetchall())
    assert srows == drows


def test_domain_mix_shares_sum_to_one_and_weights_equalize(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["text_domain_mix"](spark, SF).collect()
    assert rows
    # integer ppm / e6 outputs (HALF_UP); shares sum to 1e6 up to the
    # per-source rounding slack
    n = len(rows)
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= n
    # resampled share = share * weight must be ~uniform across sources
    for r in rows:
        share = r.share_ppm / 1e6
        weight = r.weight_e6 / 1e6
        assert abs(share * weight - 1.0 / n) < 1e-4
        # HALF_UP pinning vs the exact rational, on the collected row
        assert r.share_ppm == (2 * 10**6 * r.n_tokens
                               + sum(x.n_tokens for x in rows)) \
            // (2 * sum(x.n_tokens for x in rows))


def test_two_hop_on_path_graph(spark, monkeypatch):
    # path a-b-c-d: a reaches {b,c}, b reaches {a,c,d}, symmetric
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    out = {r.node: (r.degree, r.n_within_2)
           for r in Q.q_kg_two_hop(spark, SF).collect()}
    assert out == {"a": (1, 2), "b": (2, 3), "c": (2, 3), "d": (1, 2)}
