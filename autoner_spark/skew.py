"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly").

Where skew bites this pipeline at 10^12 turns:

* hot conversations (one conv_id with millions of turns) in per-conversation
  assembly — `collect_list` has NO map-side partial aggregation, so the hot
  key's entire payload lands on one reducer -> `salted_collect_list`
  two-phase aggregation;
* hot entities (one surface mentioned everywhere) joined against a
  non-broadcastable dimension -> `replicated_salt_join`;
* algebraic aggregations (counts/sums) do NOT need salting — Spark's hash
  aggregate already combines map-side; AQE skew-join splitting
  (session.get_spark turns it on) covers moderate join skew. Salting is for
  the two cases above where neither mechanism applies.

All salts are DETERMINISTIC (hash of a distributor column, never rand()) so
results are reproducible and partition-count independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(distributor: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(distributor), F.lit(n_salts)).cast("int")


def salted_collect_list(
    df: DataFrame,
    key_cols: list[str],
    payload: Column,
    distributor: Column,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """groupBy(key).collect_list(payload) in two phases so a hot key's
    payload is first collected across ``n_salts`` reducers, then
    concatenated. Output: key_cols + ``items`` array. ``sort=True`` makes
    the result deterministic (order-free) — required because salting
    destroys any incidental arrival order."""
    phase1 = (
        df.withColumn("__salt", _salt(distributor, n_salts))
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_list(payload).alias("__part"))
    )
    out = (
        phase1.groupBy(*key_cols)
        .agg(F.flatten(F.collect_list("__part")).alias("items"))
    )
    if sort:
        out = out.withColumn("items", F.sort_array("items"))
    return out


def replicated_salt_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    distributor: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join robust to a hot ``key``: the LEFT (large, skewed) side gets
    a deterministic salt from ``distributor``; the RIGHT side is replicated
    across all salts. Shuffle keys become (key, salt) — the hot key spreads
    over ``n_salts`` reducers. Use when the right side is too big to
    broadcast but small enough to replicate n_salts x."""
    lsalted = left.withColumn("__salt", _salt(distributor, n_salts))
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalted.join(rrep, [key, "__salt"]).drop("__salt")


def conversation_entities(mentions: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-conversation entity assembly, hot-conversation safe:
    (conv_id, entities array<string> sorted distinct)."""
    per_turn = mentions.select(
        "conv_id",
        F.col("surface").alias("entity"),
        F.col("turn_idx"),
    )
    collected = salted_collect_list(
        per_turn,
        ["conv_id"],
        F.col("entity"),
        distributor=F.col("turn_idx"),
        n_salts=n_salts,
    )
    return collected.select(
        "conv_id", F.array_distinct("items").alias("entities")
    )
