"""Semantics pins for the round-5 wave-5 operators: GROUPING SETS
bitmask/margin structure, personalized-PageRank closed form on a star,
MinHash-estimate exactness on identical docs, order-gap lag math."""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from autoner_spark.caching import release_caches

    release_caches()


def test_grouping_sets_margins_and_gid(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_grouping_sets"](spark, SF).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid bit order: (priority, status) -> status-out = 1, priority-out = 2
    assert set(by_gid) == {1, 2, 3}
    # the 2-D cells (gid 0) are deliberately NOT in the set list
    assert 0 not in by_gid
    total = by_gid[3]
    assert len(total) == 1
    assert total[0].o_orderpriority is None
    assert total[0].o_orderstatus is None
    # every margin sums to the grand total
    assert sum(r.n_orders for r in by_gid[1]) == total[0].n_orders
    assert sum(r.n_orders for r in by_gid[2]) == total[0].n_orders
    # margin rows null out exactly the grouped-out dimension
    assert all(r.o_orderstatus is None and r.o_orderpriority is not None
               for r in by_gid[1])
    assert all(r.o_orderpriority is None and r.o_orderstatus is not None
               for r in by_gid[2])


def test_ppr_star_closed_form(spark, monkeypatch):
    # star: hub a — leaves b, c, d. Seed = a (max degree).
    # r0: a=1, leaves=0
    # r1: a = 0.15;               leaves = 0.85 * (1/3)
    # r2: a = 0.15 + 0.85*0.85;   leaves = 0.85 * (0.15/3)
    # r3: a = 0.15 + 0.85*3*(0.85*0.05)
    #     leaves = 0.85 * ((0.15 + 0.7225)/3)
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    rows = {r.node: r for r in
            Q.q_kg_pagerank_personalized(spark, SF).collect()}
    assert rows["a"].is_seed == 1
    assert all(rows[leaf].is_seed == 0 for leaf in "bcd")
    l1 = 0.85 * (1 / 3)
    a2 = 0.15 + 0.85 * 3 * l1 / 1  # leaves deg 1
    l2 = 0.85 * (0.15 / 3)
    a3 = 0.15 + 0.85 * 3 * l2
    l3 = 0.85 * (a2 / 3)
    assert rows["a"].ppr == pytest.approx(a3, abs=1e-6)
    for leaf in "bcd":
        assert rows[leaf].ppr == pytest.approx(l3, abs=1e-6)


def test_minhash_estimate_exact_on_identical_docs(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    same = "alpha beta gamma delta epsilon zeta"
    spark.createDataFrame(
        [(0, same, "s"), (1, same, "s"),
         (2, "one two three four five six", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {(r.id_a, r.id_b): r for r in
            QUERIES["dedup_minhash_estimate"](spark, str(tmp_path))
            .collect()}
    r = rows[(0, 1)]
    # identical docs: all 16 signature components agree, true J = 1
    assert r.n_sig_match == 16
    assert r.est_ppm == 1_000_000
    assert r.true_ppm == 1_000_000
    assert r.inter == r.uni == 4  # 4 distinct trigrams in a 6-token doc
    # disjoint docs never become LSH candidates here
    assert (0, 2) not in rows and (1, 2) not in rows


def test_order_gaps_lag_math(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    def dt(day):
        return datetime.datetime(1996, 1, 1) + datetime.timedelta(days=day)

    spark.createDataFrame(
        [
            # customer 1: days 0, 10, 30 -> gaps 10, 20 -> avg 15.0
            (1, 1, "O", 10.0, dt(0), "1-URGENT"),
            (2, 1, "O", 10.0, dt(10), "1-URGENT"),
            (3, 1, "O", 10.0, dt(30), "1-URGENT"),
            # customer 2: gaps 1, 2 -> avg 1.5 (exact HALF_UP at e4)
            (4, 2, "O", 10.0, dt(0), "1-URGENT"),
            (5, 2, "O", 10.0, dt(1), "1-URGENT"),
            (6, 2, "O", 10.0, dt(3), "1-URGENT"),
            # customer 3: single order -> no gaps -> filtered out
            (7, 3, "O", 10.0, dt(0), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    out = {r.o_custkey: r for r in
           QUERIES["rel_order_gaps"](spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1.n_orders, r1.min_gap_days, r1.max_gap_days) == (3, 10, 20)
    assert r1.avg_gap_days == 15.0
    assert out[2].avg_gap_days == 1.5


def test_nation_trade_cross_nation_only(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    d = datetime.datetime(1996, 2, 1)
    spark.createDataFrame(
        [(0, "ALPHA", 0), (1, "BRAVO", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(1, "S1", 0, 0.0), (2, "S2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(1, "C1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 100.0, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    # s1 is the customer's own nation (ALPHA->ALPHA: excluded);
    # s2 crosses (BRAVO->ALPHA): revenue = 100 * (1 - 0.1) = 90
    spark.createDataFrame(
        [(10, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", d),
         (10, 1, 2, 2, 1.0, 100.0, 0.1, 0.0, "N", "O", d)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    rows = QUERIES["rel_nation_trade"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.supp_nation, r.cust_nation, r.year, r.n_items) == (
        "BRAVO", "ALPHA", 1996, 1)
    assert r.revenue == 90.0


def test_source_overlap_coefficient(spark, tmp_path):
    from autoner_spark.queries import QUERIES

    # sources A and B each have 2 distinct 4-gram shingles, sharing 1
    # -> overlap = 1/2 -> 500000 ppm; source C is disjoint -> no rows
    spark.createDataFrame(
        [(0, "w1 w2 w3 w4", "A"), (1, "a b c d", "A"),
         (2, "w1 w2 w3 w4", "B"), (3, "p q r s", "B"),
         (4, "x y z t", "C")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {(r.source_a, r.source_b): r for r in
            QUERIES["text_source_overlap"](spark, str(tmp_path)).collect()}
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    assert (r.n_shared, r.min_vocab, r.overlap_ppm) == (1, 2, 500000)


def test_random_walks_follow_edges(spark, monkeypatch):
    from autoner_spark import queries as Q

    # path graph a-b-c-d: every step must traverse a real edge
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    und = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
           ("c", "d"), ("d", "c")}
    rows = Q.q_kg_random_walks(spark, SF).collect()
    assert len(rows) == 8  # 4 nodes x 2 walks
    for r in rows:
        hops = r.path.split("->")
        assert len(hops) == 4 and hops[0] == r.start_node
        for x, y in zip(hops, hops[1:]):
            assert (x, y) in und, f"non-edge hop {x}->{y} in {r.path}"
    # deterministic: identical on a second run
    rows2 = Q.q_kg_random_walks(spark, SF).collect()
    assert {(r.start_node, r.walk_id, r.path) for r in rows} == {
        (r.start_node, r.walk_id, r.path) for r in rows2}
    # endpoints (deg 1) must bounce back through their only neighbor
    by = {(r.start_node, r.walk_id): r.path for r in rows}
    assert by[("a", 0)].startswith("a->b")
    assert by[("a", 1)].startswith("a->b")
