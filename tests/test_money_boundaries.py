"""Half-boundary regression suite (VERDICT r04 items 2 & 3).

Two layers:

1. The local gate's float normalization must be VALUE-exact: the old
   ``%.6g`` kept 6 *significant* digits, so a cent-level divergence in any
   value >= 1e5 hashed equal locally while the driver correctly failed it
   (exactly how the rel_rolling_spend half-cent bug shipped in r04).

2. Every money-emitting gate query must agree with its DuckDB twin on
   ADVERSARIAL half-boundary inputs — sums landing on exact half-cents,
   integer averages landing on exact x.00005 at the 4dp scale (where
   Spark's HALF_UP on the shortest-decimal repr and DuckDB's
   binary-double rounding disagree for plain ``round``). The queries are
   expected to survive because they emit scaled-integer/identity-round
   outputs, not because the fixture is kind.
"""
from __future__ import annotations

import importlib.util
import os
import re

import pytest
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "check_correctness.py"),
)
gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gate)


def test_gate_norm_is_value_exact_not_sig_digit():
    # the r04 failure: 134279.99 vs 134279.98 — %.6g collapsed both to
    # "134280"; the fixed normalization must distinguish them
    assert f"{134279.99:.6g}" == f"{134279.98:.6g}"  # the old blind spot
    assert gate.norm_value(134279.99) != gate.norm_value(134279.98)
    assert gate.norm_value(134279.99) == "134279.990000"
    # and sub-1 values still normalize at 6 decimals
    assert gate.norm_value(0.1234564) == gate.norm_value(0.1234561)
    assert gate.norm_value(0.1234567) != gate.norm_value(0.1234556)
    assert gate.norm_value(None) == "NULL"
    assert gate.norm_value(float("nan")) == "NaN"


def test_gate_canon_catches_deliberately_broken_twin():
    # a one-cent divergence at 1e5 scale in ONE row must change the canon
    spark_rows = [(1, 134279.99), (2, 7.0)]
    duck_rows = [(1, 134279.98), (2, 7.0)]
    cols = ["id", "v"]
    assert gate.canon(spark_rows, cols) != gate.canon(duck_rows, cols)
    assert gate.canon(spark_rows, cols) == gate.canon(list(spark_rows), cols)


@pytest.fixture(scope="module")
def money_dir(spark, tmp_path_factory):
    """Adversarial tables: every engineered value sits on a rounding
    boundary the old 2dp/plain-round forms could diverge at."""
    d = str(tmp_path_factory.mktemp("money"))
    ts = F.to_timestamp(F.lit("1995-01-01 00:00:00"))

    # lineitem: group ('A','O') sums disc price to exactly 0.4950 (a
    # half-cent at 2dp); group ('B','O') has 20,000 rows averaging
    # 20001/20000 = 1.00005 qty (a half at the 4dp scale, non-binary-exact
    # because the denominator carries factor 5); part 2 drives the
    # small-qty threshold with an odd filtered cents sum
    a = spark.range(1).select(
        F.lit(1).cast("long").alias("l_partkey"),
        F.lit(1).cast("long").alias("l_suppkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(0.50).alias("l_extendedprice"),
        F.lit(0.01).alias("l_discount"),
        F.lit("A").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        ts.alias("l_shipdate"),
        F.lit(1).cast("long").alias("l_orderkey"),
    )
    b = spark.range(20000).select(
        F.lit(1).cast("long").alias("l_partkey"),
        F.lit(1).cast("long").alias("l_suppkey"),
        F.when(F.col("id") == 0, 2.0).otherwise(1.0).alias("l_quantity"),
        F.lit(0.01).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit("B").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        ts.alias("l_shipdate"),
        (F.col("id") + 10).alias("l_orderkey"),
    )
    c = spark.createDataFrame(
        [(2, 1, 1.0, 0.01), (2, 1, 1.0, 0.01), (2, 1, 1.0, 0.01),
         (2, 1, 1.0, 0.04), (2, 1, 96.0, 1.00)],
        "l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double",
    ).select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        F.lit(0.0).alias("l_discount"), F.lit("C").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"), ts.alias("l_shipdate"),
        F.lit(99).cast("long").alias("l_orderkey"),
    )
    a.unionByName(b).unionByName(c).write.parquet(f"{d}/lineitem.parquet")

    spark.createDataFrame(
        [(1, "Brand#1", "T1"), (2, "Brand#4", "T2")],
        "p_partkey long, p_brand string, p_type string",
    ).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(1, 1)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(1, "XLAND")], "n_nationkey long, n_name string"
    ).write.parquet(f"{d}/nation.parquet")

    # orders: the exact r04 red-row shape — count=2 frame with odd cents
    spark.createDataFrame(
        [(1, 10, "1995-01-01", 134279.99), (1, 20, "1995-02-01", 134279.98),
         (2, 30, "1995-03-01", 10.00)],
        "o_custkey long, o_orderkey long, o_orderdate string,"
        " o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")) \
        .withColumn("o_orderstatus", F.lit("O")) \
        .write.parquet(f"{d}/orders.parquet")

    # events: one (hour, type) group with avg(k) = 1.00005
    spark.range(20000).select(
        F.col("id").cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        ts.alias("ts"),
        F.concat(F.lit('{"k": '),
                 F.when(F.col("id") == 0, "2").otherwise("1"),
                 F.lit("}")).alias("props"),
        F.lit(0.01).alias("value"),
    ).write.parquet(f"{d}/events.parquet")
    return d


MONEY_QUERIES = [
    "rel_pricing_summary",
    "rel_part_type_revenue",
    "rel_small_qty_revenue",
    "rel_events_json_hourly",
    "rel_rolling_spend",
    "rel_scd2_merge",
    "rel_event_funnel",
]


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_query_agrees_with_twin_on_half_boundaries(
    spark, money_dir, name
):
    import duckdb

    from autoner_spark.caching import release_caches
    from autoner_spark.queries import ORACLE_SQL, QUERIES

    df = QUERIES[name](spark, money_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    release_caches()

    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation", "orders", "events"):
        con.execute(
            # Spark writes a directory of part files; glob them
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{money_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(ORACLE_SQL[name])
    duck_cols = [x[0] for x in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert gate.canon(spark_rows, spark_cols) == gate.canon(
        duck_rows, duck_cols
    ), f"{name} diverges on half-boundary inputs"


# ---------------------------------------------------------------------------
# the arithmetic identity every scaled-integer money output rests on:
# (2*s*K + c) div (2*c) == round-half-up(s*K / c) for non-negative s
# ---------------------------------------------------------------------------

from fractions import Fraction
import math

from hypothesis import given
from hypothesis import strategies as st


@given(
    # s bounded so the 2*s*K + c intermediate stays inside int64 — the
    # identity is only useful where Spark/DuckDB bigint arithmetic can
    # actually evaluate it (Python would happily pass on big-ints the
    # engines overflow on)
    s=st.integers(min_value=0, max_value=10**12),
    c=st.integers(min_value=1, max_value=10**7),
    K=st.sampled_from([1, 100, 10_000, 1_000_000]),
)
def test_half_up_integer_formula_is_round_half_up(s, c, K):
    assert 2 * s * K + c <= 2**63 - 1, "strategy left the engine envelope"
    got = (2 * s * K + c) // (2 * c)
    expected = math.floor(Fraction(s * K, c) + Fraction(1, 2))
    assert got == expected


# ---------------------------------------------------------------------------
# MONEY.md enforcement: every F.round call site in the package must carry a
# same-line classification marker, and the class must be one MONEY.md defines.
# Rational-over-integer outputs must NOT use F.round at all (integer class),
# so an unmarked site is either an unclassified new query or a regression to
# the round(p/q, k) form that shipped the r04/r05 reds.
# ---------------------------------------------------------------------------

import glob

_ALLOWED_CLASSES = {"grid", "irrational", "coprime"}
_PKG = os.path.join(os.path.dirname(__file__), "..", "autoner_spark")


def test_every_round_site_is_classified():
    unmarked, badclass = [], []
    for path in glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True):
        for i, line in enumerate(open(path), start=1):
            if "F.round" not in line or line.lstrip().startswith("#"):
                continue
            m = re.search(r"#\s*money:\s*(\S+)", line)
            rel = os.path.relpath(path, _PKG)
            if m is None:
                unmarked.append(f"{rel}:{i}")
            elif m.group(1) not in _ALLOWED_CLASSES:
                badclass.append(f"{rel}:{i} ({m.group(1)})")
    assert not unmarked, (
        "F.round sites without a '# money: <class>' marker (classify per "
        f"MONEY.md or convert to the integer div form): {unmarked}"
    )
    assert not badclass, f"unknown money classes: {badclass}"


def test_twin_sql_has_no_bare_rational_round():
    """The DuckDB twins must not round a '/' rational at a fixed scale in a
    WHERE/threshold position: the integer div form is the contract. This is a
    heuristic tripwire, not a proof: it flags round( ... / ... , k) patterns
    appearing in twin SQL, excluding the documented grid-class divisions by
    powers of ten (``/ 100.0`` cents and ``/ 1e6`` ppm mappings)."""
    from autoner_spark import queries as q

    # queries whose rounded rational is irrational by UPSTREAM construction
    # (the transcendental lives in a prior CTE, invisible to this line scan):
    # zipf regresses log-freq on log-rank, so the slope is a ratio of sums
    # of logs (MONEY.md class `irrational`)
    upstream_irrational = {"text_zipf_slope"}

    offenders = []
    for name, sql in q.ORACLE_SQL.items():
        if name in upstream_irrational:
            continue
        for m in re.finditer(r"round\(([^()]*(?:\([^()]*\)[^()]*)*),\s*\d+\)",
                             sql, flags=re.I):
            inner = m.group(1)
            if "/" not in inner:
                continue
            # grid-class: division by a power-of-ten float literal only
            if re.fullmatch(r"[^/]*/\s*1(0*)(\.0)?", inner.strip()):
                continue
            # irrational class: a transcendental inside the expression
            if re.search(r"\b(ln|log|log2|log10|sqrt|exp)\s*\(", inner):
                continue
            # coprime class: the reference's +1e-6 smoothing makes the
            # reduced denominator coprime to 10 (MONEY.md)
            if "+ 0.000001" in inner:
                continue
            offenders.append((name, inner.strip()[:60]))
    assert not offenders, (
        "twin SQL rounds a rational at fixed scale (use the integer div "
        f"HALF_UP form, MONEY.md class `integer`): {offenders}"
    )


# ---------------------------------------------------------------------------
# the shared helper (autoner_spark/money.py) must bake the overflow
# discipline in: operands cast to the carrier width OUTSIDE the scale
# multiply, so an int-typed source column (F.size, cast('int') counts)
# cannot wrap int32 under non-ANSI Spark — the r06 review's finding on
# the hand-expanded sites.
# ---------------------------------------------------------------------------


def test_half_up_scaled_int_typed_input_does_not_wrap(spark):
    from autoner_spark.money import half_up_scaled

    # 2 * 1_000_000 * 3000 = 6e9 > 2^31: an uncast int multiply would
    # wrap (non-ANSI Spark int arithmetic is silent modular)
    df = spark.createDataFrame(
        [(3000, 9000)], "num int, den int"
    ).select(half_up_scaled("num", "den", 1_000_000).alias("ppm"))
    [row] = df.collect()
    assert row.ppm == 333333  # round(3000/9000, 6) * 1e6, HALF_UP


def test_half_up_scaled_matches_exact_fraction_on_halves(spark):
    from fractions import Fraction

    from autoner_spark.money import half_up_scaled

    cases = [(1, 128), (3, 128), (1, 2), (5, 8), (1, 3), (2, 3),
             (999999, 1000000), (1, 1000000), (0, 7)]
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(cases)],
        "i int, num long, den long",
    ).select("i", half_up_scaled("num", "den", 1_000_000).alias("ppm"))
    got = {r.i: r.ppm for r in df.collect()}
    for i, (n, d) in enumerate(cases):
        expected = math.floor(Fraction(n * 1_000_000, d) + Fraction(1, 2))
        assert got[i] == expected, (n, d)


def test_half_up_scaled_decimal_width_carries_past_int64(spark):
    from autoner_spark.money import half_up_scaled

    # numerator near int64 max: bigint 2*1e6*num would overflow; the
    # decimal(38,0) carrier (the domain_mix convention) must not
    from fractions import Fraction

    num, den = 2**61, 2**62 - 1
    df = spark.createDataFrame(
        [(num, den)], "num long, den long"
    ).select(
        half_up_scaled("num", "den", 1_000_000,
                       width="decimal(38,0)").alias("ppm")
    )
    [row] = df.collect()
    expected = math.floor(Fraction(num * 1_000_000, den) + Fraction(1, 2))
    assert row.ppm == expected


def test_half_up_sites_all_route_through_the_helper():
    """No Spark-side code may hand-expand the (2*K*n + d) div (2d)
    idiom: the overflow/casting discipline lives in money.half_up_scaled
    exactly once (r06 review). Docstrings may cite the algebra."""
    import ast

    offenders = []
    for path in glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True):
        if os.path.basename(path) == "money.py":
            continue
        tree = ast.parse(open(path).read())
        # docstrings are bare Expr-statement strings; any OTHER string
        # constant carrying the idiom is an expression being built
        docstrings = {
            id(node.value)
            for node in ast.walk(tree)
            if isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        }
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and "div (2" in node.value
                and id(node) not in docstrings
            ):
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, (
        f"hand-expanded HALF_UP div sites (use money.half_up_scaled): "
        f"{offenders}"
    )
