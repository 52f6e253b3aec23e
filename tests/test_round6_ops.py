"""Semantics pins for the round-6 wave: Q13 zero-count retention, Q18/Q22
strict-threshold boundaries, Q16 complaint exclusion, Q3 top-k order,
Heaps-curve monotonicity, exact decile math, clustering-coefficient and
assortativity closed forms on crafted graphs."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from autoner_spark.caching import release_caches

    release_caches()


@pytest.fixture(scope="module")
def tpch_dir(spark, tmp_path_factory):
    """Tiny crafted TPC-H-ish dir exercising every boundary the round-6
    relational queries claim: zero-order customers, an order summing to
    EXACTLY the Q18 threshold, a complaint supplier, a customer sitting
    EXACTLY on the Q22 average."""
    d = str(tmp_path_factory.mktemp("r6"))
    ntz = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731

    # customers: 1 has non-urgent orders, 2 has only an URGENT order,
    # 3 has none, 4 has a recent order, 5 sits exactly on the avg
    spark.createDataFrame(
        [(1, "c1", 0, 10.00, "BUILDING"), (2, "c2", 0, 20.00, "BUILDING"),
         (3, "c3", 1, 30.00, "AUTOMOBILE"), (4, "c4", 1, 40.00, "BUILDING"),
         (5, "c5", 2, 25.00, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")

    orders = spark.createDataFrame(
        [(10, 1, "2-HIGH", "1996-01-01", 100.0),
         (11, 1, "5-LOW", "1996-02-01", 100.0),
         (12, 2, "1-URGENT", "1996-03-01", 100.0),
         (13, 4, "2-HIGH", "2000-06-01", 100.0)],
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    orders.withColumn("o_orderstatus", F.lit("O")) \
        .write.parquet(f"{d}/orders.parquet")

    # lineitem: order 10 sums qty to exactly 300 (excluded: strict >),
    # order 11 to 301 (included); suppliers 1 (clean) and 2 (complaint)
    spark.createDataFrame(
        [(10, 1, 1, 150.0), (10, 2, 2, 150.0),
         (11, 1, 2, 301.0),
         (12, 2, 2, 5.0)],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double",
    ).select(
        "*",
        F.lit(10.00).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        ntz("1996-06-01").alias("l_shipdate"),
    ).write.parquet(f"{d}/lineitem.parquet")

    spark.createDataFrame(
        [(1, "LARGE", "Brand#2", 5), (2, "SMALL", "Brand#2", 7)],
        "p_partkey long, p_type string, p_brand string, p_size int",
    ).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(1, "s1", 0, 100.0), (2, "s2", 0, -5.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{d}/supplier.parquet")
    return d


def test_custdist_keeps_zero_order_customers(spark, tpch_dir):
    from autoner_spark.queries import QUERIES

    rows = {r.c_count: r.n_custs
            for r in QUERIES["rel_custdist"](spark, tpch_dir).collect()}
    # cust 1 -> 2 counted orders; custs 2 (urgent-only), 3 (none), 5 -> 0;
    # cust 4 -> 1. The urgent-only customer MUST land in the zero bucket
    # (filter inside the outer-join condition, not a WHERE)
    assert rows == {2: 1, 1: 1, 0: 3}


def test_large_orders_strict_threshold(spark, tpch_dir):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_large_orders"](spark, tpch_dir).collect()
    # order 10 sums to exactly 300 -> excluded; 11 (301) survives
    assert [(r.o_orderkey, r.total_qty) for r in rows] == [(11, 301)]
    assert rows[0].o_date == "1996-02-01"


def test_parts_supplier_cnt_excludes_complaint_supplier(spark, tpch_dir):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_parts_supplier_cnt"](spark, tpch_dir).collect()
    by_part = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in rows}
    # part 1 is served by suppliers 1 and 2, but 2 is a complaint
    # supplier -> count 1; part 2 is served ONLY by supplier 2 -> its
    # group vanishes entirely (not a zero row: Q16 semantics)
    assert by_part == {("Brand#2", "LARGE", 5): 1}


def test_sales_opportunity_strict_avg_and_recent_exclusion(spark, tpch_dir):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_sales_opportunity"](spark, tpch_dir).collect()
    got = {r.c_nationkey: (r.n_cust, r.total_bal_cents) for r in rows}
    # avg positive balance = 25.00: cust 5 sits EXACTLY on it -> excluded
    # (strict cross-multiplied >); cust 3 (30) and 4 (40) beat it, but 4
    # has a recent (>= 2000-01-01) order -> anti-joined away. Only 3 stays.
    assert got == {1: (1, 3000)}


def test_shipping_priority_topk_is_sorted_and_bounded(spark):
    from autoner_spark.queries import QUERIES

    rows = QUERIES["rel_shipping_priority"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    keys = [(-r.revenue, r.o_date, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """documents with doc_id 0..9 and exactly doc_id+1 tokens: token t{i}
    first appears in doc i, so vocab(t)=t+1 and the length histogram is
    uniform 1..10."""
    d = str(tmp_path_factory.mktemp("r6docs"))
    rows = []
    for i in range(10):
        rows.append((i, " ".join(f"t{j}" for j in range(i + 1))))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")
    return d


def test_vocab_growth_closed_form(spark, docs_dir):
    from autoner_spark.queries import QUERIES

    rows = sorted(QUERIES["text_vocab_growth"](spark, docs_dir).collect(),
                  key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, 11))
    # threshold_doc = (k * 9) div 10 = 0..9 -> vocab = threshold+1 distinct
    # tokens (token tj first appears in doc j), tokens seen = sum(1..t+1)
    for r in rows:
        t = (r.k * 9) // 10
        assert r.threshold_doc == t
        assert r.vocab_size == t + 1
        assert r.n_tokens_seen == (t + 1) * (t + 2) // 2
    assert rows[-1].vocab_size == 10


def test_length_deciles_exact_uniform(spark, docs_dir):
    from autoner_spark.queries import QUERIES

    rows = {r.decile: r.len_at_decile
            for r in QUERIES["text_length_deciles"](spark, docs_dir)
            .collect()}
    # N=10, lengths 1..10 each once: need(d) = d, cum(len L) = L ->
    # smallest L with cum >= d is exactly d
    assert rows == {d: d for d in range(1, 10)}


def test_clustering_coeff_triangle_with_pendant(spark, monkeypatch):
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    rows = {r.node: r for r in Q.QUERIES["kg_clustering_coeff"](
        spark, SF).collect()}
    # a,b: deg 2 in one triangle -> 1.0; c: deg 3, one triangle ->
    # HALF_UP ppm of 1/3; d: deg 1 -> excluded
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"].clustering == 1.0 and rows["a"].n_triangles == 1
    assert rows["b"].clustering == 1.0
    assert rows["c"].deg == 3
    assert rows["c"].clustering == 0.333333
    assert "d" not in rows


def test_assortativity_star_is_minus_one(spark, monkeypatch):
    from autoner_spark import queries as Q

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")],
        "surface_a string, surface_b string",
    )
    monkeypatch.setattr(Q, "q_kg_cooccurrence", lambda s, sf: pairs)
    rows = Q.QUERIES["kg_assortativity"](spark, SF).collect()
    # pure star: every edge joins the deg-3 hub to a deg-1 leaf -> the
    # degree sequence at the two endpoints is perfectly anticorrelated
    assert len(rows) == 1
    assert rows[0].n_edges == 6
    assert rows[0].assortativity == -1.0
