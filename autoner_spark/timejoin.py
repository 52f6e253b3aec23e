"""Time-series joins Spark lacks as primitives: AS-OF and RANGE joins.

Both are expressed as compositions that stay scale-safe — neither ever
plans a nested-loop/cartesian node:

* ``asof_join`` — each left row picks the LATEST right row with
  right.ts <= left.ts per key (the point-in-time lookup every feature
  pipeline needs). Implemented as union-with-role-tag + ONE window pass
  with ``last(..., ignorenulls)``: O(n log n) sort per key partition, no
  range fan-out at all. This is the batch dual of a streaming as-of; the
  DuckDB twin uses its native ``ASOF JOIN`` — two independent
  implementations of the same semantics.

* ``range_join`` — all (left, right) pairs with
  right.ts - left.ts in [lo, hi] per key. A naive inequality join plans a
  per-key nested loop; here right rows are hashed into fixed-width time
  buckets (width = hi - lo) and each left row probes the <= 2 buckets its
  window can overlap — an EQUI-join on (key, bucket) plus a residual range
  filter, so the plan is a plain shuffled hash join with bounded 2x
  fan-out on the left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + the latest right row (its ``value_cols``) with
    right.ts <= left.ts, per ``keys``; NULLs where no right row precedes.

    Ties: a right row at exactly left.ts matches (<=); among right rows
    sharing one timestamp the greatest ``value_cols`` tuple wins
    (deterministic). Right rows with a NULL timestamp never match (ASOF
    semantics: the <= comparison is unknowable). All value columns are
    carried as ONE struct so the matched values always come from a single
    right row — carrying them independently would stitch columns from
    different rows whenever a matched row holds a NULL value.

    HOT-KEY BOUND: each key's union (left + right rows) sorts inside ONE
    window partition — inherent to as-of semantics, which need a single
    time-ordered pass per key. With user/session-grained keys this is the
    right plan at any corpus size (WindowExec sorts spill to disk, so a
    large key is slow-but-correct, pinned by pytest); a single global hot
    key holding ~the whole table serializes that table through one task.
    If the keys are that coarse, pre-split them by a time-range column
    (e.g. day) and as-of join within ranges, seeding each range with the
    previous range's last right row."""
    lstruct = StructType([left.schema[c] for c in left.columns])
    rstruct_t = StructType([right.schema[v] for v in value_cols])
    lu = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_role"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rstruct_t).alias("_r"),
    )
    ru = right.filter(F.col(ts_col).isNotNull()).select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_role"),
        F.lit(None).cast(lstruct).alias("_l"),
        F.struct(*value_cols).alias("_r"),
    )
    # right rows (_role=0) sort BEFORE a left row at the same ts -> included;
    # the struct ordering makes the greatest value tuple win among ts ties
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_role", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("_role") == 0, F.col("_r")), ignorenulls=True
    ).over(w).alias("_rm")
    tagged = lu.unionByName(ru).select("_role", "_l", carried)
    out_left = [F.col("_l")[c].alias(c) for c in left.columns]
    out_right = [F.col("_rm")[v].alias(v) for v in value_cols]
    return tagged.filter(F.col("_role") == 1).select(*out_left, *out_right)


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lo: int,
    hi: int,
    salt: int | None = None,
) -> DataFrame:
    """All (left x right) rows with right_ts - left_ts in [lo, hi] per
    ``keys`` (integer time units; lo <= hi). Column names of the two sides
    must be disjoint apart from ``keys``.

    Bucket width = hi - lo: right lands in floor(right_ts / W); a left
    row's window [left_ts+lo, left_ts+hi] overlaps at most 2 consecutive
    buckets, enumerated with ``sequence`` and exploded — turning the range
    predicate into an equi-join + residual filter.

    HOT-KEY GUARD: one (key, bucket) pair whose two sides both carry many
    rows hashes to a single join partition (and its output is inherently
    quadratic in that group). ``salt`` enables the standard two-phase
    mitigation: right rows scatter across ``salt`` deterministic
    sub-partitions (hash of right_ts) and each left row replicates to all
    of them, so the hot group's build side splits ``salt`` ways at the
    cost of a salt-times left fan-out. Output is exactly the unsalted
    result (each pair meets in exactly one sub-partition; pinned by
    pytest). Leave ``None`` unless keys are coarse enough to skew.

    Salt preconditions (the sub-partition hash covers the FULL right
    row so identical-timestamp bursts still scatter): (1) every right
    column must be hashable by ``F.hash`` — in particular a MapType
    column fails analysis when ``salt`` is set (drop or cast it first);
    (2) rows identical in ALL right columns still co-locate in one
    sub-partition — if exact duplicate rows can burst, carry a unique
    id column on the right side so they scatter."""
    if lo > hi:
        raise ValueError(f"empty range: lo ({lo}) > hi ({hi})")
    width = max(hi - lo, 1)
    r = right.withColumn(
        "_bkt", F.floor(F.col(right_ts) / width).cast("long")
    )
    l_ = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((F.col(left_ts) + lo) / width).cast("long"),
                F.floor((F.col(left_ts) + hi) / width).cast("long"),
            )
        ),
    )
    join_keys = [*keys, "_bkt"]
    if salt is not None:
        if salt < 2:
            raise ValueError(f"salt ({salt}) must be >= 2 to split anything")
        # salt over the FULL right row, not just right_ts: the most common
        # real skew shape is an event burst at one identical timestamp,
        # and hash(right_ts) would send that whole burst to a single
        # sub-partition — splitting nothing exactly where it matters.
        # Preconditions this adds: every right column must be hashable
        # (drop MapType columns before salting), and rows identical in
        # ALL columns still co-locate — carry a unique id column on the
        # right side if exact duplicates can burst
        r = r.withColumn(
            "_salt",
            F.pmod(F.hash(*[F.col(c) for c in right.columns]), salt),
        )
        l_ = l_.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        join_keys.append("_salt")
    joined = l_.join(r, join_keys)
    delta = F.col(right_ts) - F.col(left_ts)
    out = joined.filter((delta >= lo) & (delta <= hi)).drop("_bkt")
    return out.drop("_salt") if salt is not None else out
