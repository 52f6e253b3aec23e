"""As-of and range joins: semantics vs naive references, plan shape."""

import pytest

from pyspark.sql import functions as F


def test_asof_join_semantics(spark):
    from autoner_spark.timejoin import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "L1"), ("u1", 205, "L2"), ("u2", 50, "L3"),
         ("u3", 10, "L4")],  # u3 has no right rows at all
        "k string, tus long, lid string",
    )
    right = spark.createDataFrame(
        [("u1", 100, "R-tie"),    # exactly at L1's ts -> matches (<=)
         ("u1", 90, "R-early"), ("u1", 200, "R-mid"),
         ("u1", 300, "R-late"),   # after both lefts -> never matches
         ("u2", 60, "R-after")],  # after L3 -> no match
        "k string, tus long, rid string",
    )
    got = {r.lid: r.rid
           for r in asof_join(left, right, ["k"], "tus", ["rid"]).collect()}
    assert got == {"L1": "R-tie", "L2": "R-mid", "L3": None, "L4": None}

    # determinism under repartitioning
    again = {r.lid: r.rid
             for r in asof_join(left.repartition(7), right.repartition(5),
                                ["k"], "tus", ["rid"]).collect()}
    assert again == got


def test_range_join_matches_naive_inequality_join(spark):
    """Bucketed range join == the naive inequality join on a randomized
    fixture, and its plan must be an equi-join (no nested loop)."""
    import random

    from autoner_spark.timejoin import range_join

    rng = random.Random(42)
    left = spark.createDataFrame(
        [(f"u{i % 7}", i, rng.randrange(0, 1000)) for i in range(300)],
        "k string, lid long, lts long",
    )
    right = spark.createDataFrame(
        [(f"u{i % 7}", 1000 + i, rng.randrange(0, 1000)) for i in range(300)],
        "k string, rid long, rts long",
    )
    lo, hi = -37, 53
    got = {(r.lid, r.rid)
           for r in range_join(left, right, ["k"], "lts", "rts",
                               lo=lo, hi=hi).collect()}
    naive = {
        (r.lid, r.rid)
        for r in left.join(right, "k")
        .filter((F.col("rts") - F.col("lts") >= lo)
                & (F.col("rts") - F.col("lts") <= hi)).collect()
    }
    assert got == naive and got

    plan = range_join(left, right, ["k"], "lts", "rts", lo=lo, hi=hi) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    with pytest.raises(ValueError, match="empty range"):
        range_join(left, right, ["k"], "lts", "rts", lo=5, hi=4)


def test_asof_join_null_values_and_null_timestamps(spark):
    """Review regressions: (a) a matched right row with a NULL value column
    must NOT be stitched with values from an older row (one-struct carry);
    (b) right rows with NULL timestamps never match anything."""
    from autoner_spark.timejoin import asof_join

    left = spark.createDataFrame([("u1", 100, "L1")],
                                 "k string, tus long, lid string")
    right = spark.createDataFrame(
        [("u1", 50, 50, "R-old"), ("u1", 90, 90, None)],
        "k string, tus long, rts long, rid string",
    )
    row = asof_join(left, right, ["k"], "tus", ["rts", "rid"]).collect()[0]
    # the matched row is (rts=90, rid=NULL) — not the frankenrow (90,'R-old')
    assert (row.rts, row.rid) == (90, None)

    right2 = spark.createDataFrame(
        [("u1", None, None, "R-nullts")],
        "k string, tus long, rts long, rid string",
    )
    row2 = asof_join(left, right2, ["k"], "tus", ["rts", "rid"]).collect()[0]
    assert (row2.rts, row2.rid) == (None, None)


def test_time_joins_hot_key(spark):
    """One pathologically hot key (every row shares it): both joins stay
    CORRECT — the hot key serializes through one sorted window / join
    partition (slow-but-right, the documented bound), never drops or
    duplicates pairs. The salted range join must return exactly the
    unsalted result while actually splitting the hot group across salt
    sub-partitions."""
    from autoner_spark.timejoin import asof_join, range_join

    n = 5_000
    left = spark.range(n).select(
        F.lit("hot").alias("k"),
        (F.col("id") * 7 % 9973).alias("lts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(n).select(
        F.lit("hot").alias("k"),
        (F.col("id") * 13 % 9973).alias("rts"),
        (F.col("id") + 1_000_000).alias("rid"),
    )

    # asof: spot-check against a driver-side replay on the same data
    # (asof_join takes ONE ts column name shared by both sides)
    r_asof = right.withColumnRenamed("rts", "lts")
    got = {r.lid: r.rid
           for r in asof_join(left, r_asof, ["k"], "lts", ["rid"]).collect()}
    rrows = sorted((r.rts, r.rid) for r in right.collect())
    import bisect
    rts_sorted = [t for t, _ in rrows]
    for r in left.collect():
        i = bisect.bisect_right(rts_sorted, r.lts)
        expect = rrows[i - 1][1] if i else None
        # ties at the matched ts resolve to the greatest rid; bisect_right
        # already lands past the tie group, so rrows[i-1] is that row
        assert got[r.lid] == expect, r.lid
    assert len(got) == n

    # range: salted == unsalted (exact pair multiset) on the hot key
    plain = {(r.lid, r.rid)
             for r in range_join(left, right, ["k"], "lts", "rts",
                                 lo=-50, hi=50).collect()}
    salted = [(r.lid, r.rid)
              for r in range_join(left, right, ["k"], "lts", "rts",
                                  lo=-50, hi=50, salt=8).collect()]
    assert set(salted) == plain and len(salted) == len(plain) and plain

    with pytest.raises(ValueError, match="salt"):
        range_join(left, right, ["k"], "lts", "rts", lo=0, hi=1, salt=1)


def test_asof_join_tied_right_timestamps_deterministic(spark):
    """Ties on the matched timestamp resolve to the greatest value tuple —
    and the gate twin resolves identically (max id at the matched ts)."""
    from autoner_spark.timejoin import asof_join

    left = spark.createDataFrame([("u1", 100, "L1")],
                                 "k string, tus long, lid string")
    right = spark.createDataFrame(
        [("u1", 90, 90, "RA"), ("u1", 90, 90, "RB")],
        "k string, tus long, rts long, rid string",
    )
    out = {(r.rts, r.rid)
           for r in asof_join(left, right, ["k"], "tus",
                              ["rts", "rid"]).collect()}
    assert out == {(90, "RB")}


def test_range_join_salt_scatters_identical_timestamp_burst(spark):
    """An event burst at ONE identical timestamp is the common real skew
    shape. Salting on hash(right_ts) alone sends the whole burst to a
    single sub-partition (splitting nothing); the row-unique salt must
    scatter it while the salted result stays exactly the unsalted one."""
    from autoner_spark.timejoin import range_join

    n = 2_000
    left = spark.range(50).select(
        F.lit("hot").alias("k"), F.lit(100).alias("lts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(n).select(
        F.lit("hot").alias("k"), F.lit(120).alias("rts"),  # one burst ts
        (F.col("id") + 1_000_000).alias("rid"),
    )

    plain = {(r.lid, r.rid)
             for r in range_join(left, right, ["k"], "lts", "rts",
                                 lo=0, hi=50).collect()}
    salted = [(r.lid, r.rid)
              for r in range_join(left, right, ["k"], "lts", "rts",
                                  lo=0, hi=50, salt=8).collect()]
    assert set(salted) == plain and len(salted) == len(plain)
    assert len(plain) == 50 * n  # every pair in range

    # the salt expression (mirror of the implementation: hash over the
    # full right row) actually scatters the burst across sub-partitions
    n_salts = (
        right.select(
            F.pmod(F.hash(*[F.col(c) for c in right.columns]), F.lit(8))
            .alias("s")
        ).distinct().count()
    )
    assert n_salts > 1, "identical-ts burst not scattered"
