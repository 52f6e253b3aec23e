"""Catalog shim: conf shape, backend selection, fallback round-trip, and a
jar-gated Iceberg writeTo test (skips when no Iceberg runtime jar)."""

import pytest

from pyspark.sql import functions as F

from autoner_spark import synth
from autoner_spark.catalog import (
    ICEBERG_CATALOG_IMPL,
    TableCatalog,
    catalog_conf,
    iceberg_available,
)


def test_catalog_conf_shape():
    conf = catalog_conf("/tmp/wh", name="autoner")
    assert conf["spark.sql.catalog.autoner"] == ICEBERG_CATALOG_IMPL
    assert conf["spark.sql.catalog.autoner.type"] == "hadoop"
    assert conf["spark.sql.catalog.autoner.warehouse"] == "/tmp/wh"


def test_parquet_fallback_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"), force_parquet=True)
    t = synth.synth_transcripts(spark, 10, partitions=2).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
    )
    assert not cat.exists("transcripts")
    cat.create_or_replace(t, "transcripts", partition_by=("bucket",))
    assert cat.exists("transcripts")
    back = cat.read("transcripts")
    assert back.count() == t.count()
    # partition pruning must reach the scan in the fallback layout too
    plan = back.filter(F.col("bucket") == 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan

    before = cat.read("transcripts").count()
    cat.append(t.filter(F.col("bucket") == 0).drop("bucket"), "extra")
    cat.append(t.filter(F.col("bucket") == 1).drop("bucket"), "extra")
    assert cat.read("extra").count() == t.filter("bucket <= 1").count()
    assert cat.read("transcripts").count() == before

    # appending to a PARTITIONED fallback table requires the same layout:
    # flat files under a partitioned root would break partition discovery
    with pytest.raises(ValueError, match="partitioned"):
        cat.append(t.drop("bucket"), "transcripts")
    cat.append(t.limit(3), "transcripts", partition_by=("bucket",))
    assert cat.read("transcripts").count() == before + 3

    # ...and the mirror case: a PARTITIONED append onto a flat table mixes
    # layouts just the same — must be rejected, not discovered-broken later
    with pytest.raises(ValueError, match="flat"):
        cat.append(t, "extra", partition_by=("bucket",))
    assert cat.read("extra").count() == t.filter("bucket <= 1").count()


def test_iceberg_writeto_path(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    assert cat.use_iceberg
    t = synth.synth_transcripts(spark, 10, partitions=2).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
    )
    cat.create_or_replace(t, "transcripts", partition_by=("bucket",))
    assert cat.read("transcripts").count() == t.count()
    cat.append(t.limit(5), "transcripts")
    assert cat.read("transcripts").count() == t.count() + 5


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key must sort-merge-join with ZERO
    Exchange nodes — the co-located-join layout for repeatedly-joined fact
    tables at scale (a plain parquet read of the same files re-shuffles)."""
    t = synth.synth_transcripts(spark, 200, partitions=4).select(
        "conv_id", "turn_idx", "text"
    )
    agg = t.groupBy("conv_id").count()
    cat = TableCatalog(spark, str(tmp_path / "wh"), force_parquet=True)
    cat.write_bucketed(t, "bk_turns", "conv_id", n_buckets=8)
    cat.write_bucketed(agg, "bk_counts", "conv_id", n_buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = cat.read_bucketed("bk_turns").join(
            cat.read_bucketed("bk_counts"), "conv_id"
        )
        assert j.count() == t.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # contrast: the SAME files read without catalog metadata shuffle
        raw = spark.read.parquet(str(tmp_path / "wh" / "bk_turns")).join(
            spark.read.parquet(str(tmp_path / "wh" / "bk_counts")), "conv_id"
        )
        raw.count()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_turns")
        spark.sql("DROP TABLE IF EXISTS bk_counts")
