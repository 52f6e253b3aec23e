"""Iceberg-shaped catalog layer (SURVEY.md §1.1 D1).

The north rule names Iceberg tables (hidden partitioning, atomic commits,
MERGE-based resumability). This sandbox has no Iceberg jars, so the layer is
a SHIM with two backends behind one API:

* **iceberg** — when the Iceberg Spark runtime is on the classpath:
  configures a ``SparkCatalog`` (hadoop type) and writes through the V2
  ``df.writeTo(catalog.table).partitionedBy(...)`` path, whose job commit is
  an atomic metadata swap;
* **parquet** — otherwise: the same logical layout as a hash-partitioned
  parquet directory tree (``partitionBy`` buckets; what autoner_spark.lineage
  builds on), which preserves partition pruning and per-bucket atomic job
  commits, just without snapshot isolation or hidden partitioning.

``CATALOG_CONF`` is exactly what a production user passes to spark-submit
(``--conf`` pairs or SparkSession.builder.config) together with
``--packages org.apache.iceberg:iceberg-spark-runtime-...``; the jar-gated
pytest exercises the writeTo path whenever a jar is present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_NAME = "autoner"
ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def catalog_conf(warehouse: str, name: str = CATALOG_NAME) -> dict[str, str]:
    """The spark conf pairs that register an Iceberg hadoop catalog —
    suitable for SparkSession.builder.config(map=...) or spark-submit
    --conf."""
    return {
        f"spark.sql.catalog.{name}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:  # noqa: BLE001 — any JVM error means "not loadable"
        return False


class TableCatalog:
    """write/read named tables through Iceberg when available, else the
    partitioned-parquet layout. The API (name + bucket column) is the stable
    contract; the backend is an environment detail."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 name: str = CATALOG_NAME, force_parquet: bool = False):
        self.spark = spark
        self.warehouse = warehouse
        self.name = name
        self.use_iceberg = (not force_parquet) and iceberg_available(spark)
        if self.use_iceberg:
            for k, v in catalog_conf(warehouse, name).items():
                spark.conf.set(k, v)

    def _ident(self, table: str) -> str:
        return f"{self.name}.db.{table}"

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def create_or_replace(self, df: DataFrame, table: str,
                          partition_by: tuple[str, ...] = ()) -> None:
        if self.use_iceberg:
            w = df.writeTo(self._ident(table))
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.using("iceberg").createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(table))

    def append(self, df: DataFrame, table: str,
               partition_by: tuple[str, ...] = ()) -> None:
        """Append rows. The parquet fallback has no table metadata, so a
        partitioned table needs the SAME ``partition_by`` on every append —
        mixing partitioned and flat files under one root makes Spark's
        partition discovery fail on the next read. Guarded here instead of
        failing later. (Iceberg tracks its partition spec itself.)"""
        if self.use_iceberg:
            df.writeTo(self._ident(table)).append()
            return
        path = self._path(table)
        if os.path.isdir(path):
            existing_partitioned = any(
                "=" in name and os.path.isdir(os.path.join(path, name))
                for name in os.listdir(path)
            )
            existing_flat = any(
                name.endswith(".parquet") for name in os.listdir(path)
            )
            if existing_partitioned and not partition_by:
                raise ValueError(
                    f"table '{table}' is partitioned on disk; append() needs "
                    f"the same partition_by to keep the layout consistent"
                )
            if existing_flat and partition_by:
                # the mirror case: a partitioned append onto a flat table
                # produces the same mixed layout that breaks partition
                # discovery on the next read
                raise ValueError(
                    f"table '{table}' is flat on disk; a partitioned "
                    f"append() would mix layouts — drop partition_by or "
                    f"rewrite with create_or_replace"
                )
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_bucketed(self, df: DataFrame, table: str, key: str,
                       n_buckets: int = 32) -> None:
        """Persist ``df`` hash-BUCKETED (and sorted) by ``key``: two tables
        bucketed the same way join WITHOUT a shuffle (both sides' output
        partitioning already satisfies the join requirement) — the
        co-located-join layout for fact tables that are joined repeatedly
        on the same key at scale. Parquet backend: ``bucketBy`` +
        ``saveAsTable`` (bucketing metadata lives in the session catalog;
        the files are external under the warehouse). Iceberg backend: the
        hidden-partitioning equivalent is ``partitionedBy(bucket(n, key))``
        on the V2 writer."""
        if self.use_iceberg:
            (df.writeTo(self._ident(table))
               .partitionedBy(F.bucket(n_buckets, F.col(key)))
               .using("iceberg").createOrReplace())
            return
        (df.write.mode("overwrite")
           .bucketBy(n_buckets, key).sortBy(key)
           .option("path", self._path(table))
           .format("parquet")
           .saveAsTable(table))

    def read_bucketed(self, table: str) -> DataFrame:
        """Read a bucketed table THROUGH THE CATALOG — a plain
        ``read.parquet`` on the files would lose the bucketing metadata
        and re-shuffle on the next join."""
        if self.use_iceberg:
            return self.spark.read.table(self._ident(table))
        return self.spark.table(table)

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(table))
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._ident(table))
        return os.path.isdir(self._path(table))
