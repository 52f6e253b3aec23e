"""Streaming exact deduplication with BOUNDED state.

``dropDuplicates`` on an unbounded stream keeps every key ever seen —
state grows with corpus history and eventually OOMs the executors.
``dropDuplicatesWithinWatermark`` keeps a hash's state only within the
watermark horizon: the right semantics for ingest dedup, where duplicates
arrive close together (re-sent batches, crawler retries) and a duplicate
older than the horizon is acceptable to re-admit (the batch dedup pass
downstream catches it). State size is bounded by (arrival rate x horizon),
independent of total corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Streaming df -> first-seen rows per content hash within the
    watermark horizon. Emits in append mode; the content hash column is
    kept so downstream sinks can join back."""
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
