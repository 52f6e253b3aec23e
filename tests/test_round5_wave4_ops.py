"""Semantics pins for the round-5 wave-4 operators (beyond the DuckDB
gate): KMV exactness below k and estimator formula above k, epoch-shuffle
permutation/determinism, Adamic-Adar weights on a known graph, Q21-shape
sole-blame logic, Q11-shape strict threshold boundary, Q15-shape ties,
contamination-fraction HALF_UP ppm, bigram surprisal closed forms, exact
Pearson endpoints, IVF recall bounds."""
from __future__ import annotations

import datetime
import hashlib
import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from autoner_spark.caching import release_caches

    release_caches()


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_kmv_exact_below_k(spark):
    # sf0.001 has 15 distinct users < k=64: the sketch IS the exact count
    from autoner_spark.queries import QUERIES

    row = QUERIES["rel_kmv_distinct"](spark, SF).collect()[0]
    assert row.k == 64
    assert row.n_vals == row.true_distinct == row.est_distinct == 15


def test_kmv_estimator_formula_above_k(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    n_users = 500
    spark.createDataFrame(
        [(i, datetime.datetime(2020, 1, 1), i % n_users, "view", 1.0, "{}")
         for i in range(2 * n_users)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    row = QUERIES["rel_kmv_distinct"](spark, str(tmp_path)).collect()[0]
    hs = sorted({_md5_u32(f"kmv:{u}") for u in range(n_users)})
    kth = hs[63]
    assert row.n_vals == 64 and row.kth_hash == kth
    assert row.est_distinct == (63 * 4294967296) // kth
    assert row.true_distinct == n_users
    # the sketch should land in the right ballpark on 500 uniform hashes
    assert 250 < row.est_distinct < 1000


def test_epoch_shuffle_is_a_permutation_and_epochs_differ(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    n = 97  # prime, not a bucket multiple
    spark.createDataFrame(
        [(i, f"doc {i}", "s") for i in range(n)],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = QUERIES["text_epoch_shuffle"](spark, str(tmp_path)).collect()
    by_epoch = {0: {}, 1: {}}
    for r in rows:
        by_epoch[r.epoch][r.doc_id] = r.position
    for ep in (0, 1):
        assert sorted(by_epoch[ep].values()) == list(range(n))
    # the two epochs are different permutations (md5-keyed)
    assert by_epoch[0] != by_epoch[1]
    # deterministic: a second run reproduces byte-identical positions
    rows2 = QUERIES["text_epoch_shuffle"](spark, str(tmp_path)).collect()
    assert {(r.epoch, r.doc_id, r.position) for r in rows2} == {
        (r.epoch, r.doc_id, r.position) for r in rows
    }


def test_adamic_adar_known_graph(spark, monkeypatch):
    # edges: (x,m1),(y,m1),(x,m2),(y,m2),(z,m2)
    # deg: m1=2, m2=3, x=2, y=2, z=1
    # AA(x,y) = 1/ln2 + 1/ln3 (shared m1,m2); AA(x,z) = 1/ln3 (shared m2)
    # AA(m1,m2) = 2/ln2 (shared x,y, deg 2 each)
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("x", "m1"), ("y", "m1"), ("x", "m2"), ("y", "m2"), ("z", "m2")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    rows = {(r.surface_a, r.surface_b): (r.n_shared, r.aa_score)
            for r in Q.q_kg_adamic_adar(spark, SF).collect()}
    assert rows[("x", "y")][0] == 2
    assert rows[("x", "y")][1] == pytest.approx(
        1 / math.log(2) + 1 / math.log(3), abs=1e-6)
    assert rows[("x", "z")] == (1, pytest.approx(1 / math.log(3), abs=1e-6))
    assert rows[("m1", "m2")] == (2, pytest.approx(2 / math.log(2), abs=1e-6))
    # z's only neighbor m2 never contributes a wedge through deg-1 nodes
    assert ("y", "z") in rows  # shares m2 like (x,z)


def _write_li(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_returnflag string, "
        "l_quantity double, l_extendedprice double, l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")


def _write_supp(spark, tmp_path, n):
    spark.createDataFrame(
        [(i, f"S{i}", 0, 0.0) for i in range(1, n + 1)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{tmp_path}/supplier.parquet")


def test_supplier_waiting_sole_blame_only(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    d = datetime.datetime(1996, 2, 1)
    _write_li(spark, tmp_path, [
        # o1: s1 returned, s2 clean -> s1 sole-blamed
        (1, 1, "R", 1.0, 10.0, d), (1, 2, "N", 1.0, 10.0, d),
        # o2: both returned -> nobody blamed
        (2, 1, "R", 1.0, 10.0, d), (2, 2, "R", 1.0, 10.0, d),
        # o3: single-supplier order -> excluded (needs another supplier)
        (3, 1, "R", 1.0, 10.0, d),
        # o4: s2 returned among three suppliers -> s2 sole-blamed
        (4, 2, "R", 1.0, 10.0, d), (4, 1, "N", 1.0, 10.0, d),
        (4, 3, "A", 1.0, 10.0, d),
    ])
    _write_supp(spark, tmp_path, 3)
    out = {r.s_name: r.n_orders
           for r in QUERIES["rel_supplier_waiting"](spark, str(tmp_path))
           .collect()}
    assert out == {"S1": 1, "S2": 1}


def test_important_parts_threshold_is_strict(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    d = datetime.datetime(1996, 2, 1)
    # total = 1600 cents; part 1 holds exactly 1/1600 (NOT >) -> excluded
    spark.createDataFrame(
        [(1, "p one", "B", "T", 1, 1.0), (2, "p two", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(1, 1, 1, "N", 1.0, 0.01, d), (2, 2, 1, "N", 1.0, 15.99, d)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_returnflag string, l_quantity double, l_extendedprice double, "
        "l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    rows = QUERIES["rel_important_parts"](spark, str(tmp_path)).collect()
    assert [(r.p_partkey, r.revenue_cents) for r in rows] == [(2, 1599)]


def test_top_supplier_keeps_ties_and_window(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    inside = datetime.datetime(1996, 2, 1)
    outside = datetime.datetime(1997, 1, 1)
    _write_li(spark, tmp_path, [
        (1, 1, "N", 1.0, 50.00, inside),
        (2, 2, "N", 1.0, 50.00, inside),     # tie with s1
        (3, 3, "N", 1.0, 10.00, inside),     # below max
        (4, 3, "N", 1.0, 999.00, outside),   # outside the quarter
    ])
    _write_supp(spark, tmp_path, 3)
    rows = QUERIES["rel_top_supplier"](spark, str(tmp_path)).collect()
    assert sorted((r.s_suppkey, r.total_cents) for r in rows) == [
        (1, 5000), (2, 5000)]


def test_contamination_frac_half_up_ppm(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    # doc 0 is the benchmark (id % 20 == 0). doc 1 shares exactly one of
    # its four 4-gram shingles -> 1/4 -> 250000 ppm
    bench = "a b c d e"           # shingles: "a b c d", "b c d e"
    doc1 = "a b c d x y z"        # shingles: "a b c d", "b c d x",
    #                               "c d x y", "d x y z" -> 1/4 hit
    spark.createDataFrame(
        [(0, bench, "s"), (1, doc1, "s")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r.doc_id: r for r in
            QUERIES["text_contamination_frac"](spark, str(tmp_path))
            .collect()}
    assert 0 not in rows  # benchmark docs are never scored
    r = rows[1]
    assert (r.n_shingles, r.n_hit) == (4, 1)
    assert r.frac_ppm == 250000
    # HALF_UP boundary: 1/3 -> 333333.33 ppm -> 333333
    assert (2 * 1000000 * 1 + 3) // 6 == 333333


def test_bigram_surprisal_closed_forms(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    # doc 0: "a a a a" -> p(a|a)=1 -> surprisal 0
    # docs 1/2: "x y" / "x z" -> p(y|x)=p(z|x)=1/2 -> surprisal ln2
    spark.createDataFrame(
        [(0, "a a a a", "s"), (1, "x y", "s"), (2, "x z", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r.doc_id: r for r in
            QUERIES["text_bigram_surprisal"](spark, str(tmp_path)).collect()}
    assert rows[0].n_bigrams == 3
    assert rows[0].surprisal_nats == pytest.approx(0.0, abs=1e-9)
    for d in (1, 2):
        assert rows[d].n_bigrams == 1
        assert rows[d].surprisal_nats == pytest.approx(math.log(2),
                                                       abs=1e-6)


def test_corr_exact_endpoints(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    d = datetime.datetime(1996, 2, 1)
    # flag N: price = 2 * quantity dollars -> corr exactly 1
    # flag R: price = (100 - quantity) dollars -> corr exactly -1
    # flag A: constant quantity -> zero variance -> NULL
    rows = []
    for q in (1.0, 2.0, 3.0, 4.0):
        rows.append((1, 1, "N", q, 2.0 * q, d))
        rows.append((2, 1, "R", q, 100.0 - q, d))
        rows.append((3, 1, "A", 5.0, 10.0 * q, d))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_returnflag string, "
        "l_quantity double, l_extendedprice double, l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.l_returnflag: r for r in
           QUERIES["rel_corr_qty_price"](spark, str(tmp_path)).collect()}
    assert out["N"].corr_qty_price == pytest.approx(1.0, abs=1e-9)
    assert out["R"].corr_qty_price == pytest.approx(-1.0, abs=1e-9)
    assert out["A"].corr_qty_price is None
    assert all(out[f].n == 4 for f in "NRA")


def test_ivf_recall_bounds_and_determinism(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["sim_ivf_recall"](spark, SF).collect()
    assert len(rows) == 10
    assert all(r.k == 3 and 0 <= r.n_hit <= 3 for r in rows)
    rows2 = QUERIES["sim_ivf_recall"](spark, SF).collect()
    assert {(r.query_id, r.n_hit) for r in rows} == {
        (r.query_id, r.n_hit) for r in rows2}
