"""SparkSession factory with scale-appropriate defaults.

Local mode here (no real cluster in the sandbox); the configs are the ones
that matter at cluster scale: AQE on (runtime re-planning + skew-join
splitting), Arrow execution for pandas UDFs, bounded Arrow batch sizes so
executor memory stays flat regardless of partition size, and shuffle
partition counts sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "autoner-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Long-running-driver hygiene: ContextCleaner frees finished
        # broadcast/shuffle blocks only when the JVM garbage-collects, and
        # a large heap can go WAY past the default 30min periodic-GC
        # interval without one — observed here as "Not enough memory to
        # build and broadcast" after ~60 back-to-back queries in one
        # driver. 1min keeps the memory store bounded by live state; the
        # same setting a production always-on Spark driver runs with.
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
