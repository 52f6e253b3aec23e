"""Tracked persist(): cache-hygiene for multi-consumer query subtrees.

Several gate queries persist an internal subtree (the mention lineage, the
grouped shingle relation, the DP label spans) because two or more consumers
read it within one returned plan. The persist is load-bearing — without it
the expensive lineage runs once per consumer — but a bare ``.persist()``
leaves the cached relation resident after the caller has consumed the
result, and a long-lived session running all gate queries accumulates dead
cached lineages until Spark's LRU evicts them.

``persist_tracked`` registers every such handle; ``release_caches()``
unpersists everything registered since the last release. The correctness
gate, bench harness, production job (tools/run_job.py) and the pytest
suite call it after each query's consuming action; any other library
consumer should do the same (or call ``spark.catalog.clearCache()``).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later ``release_caches()``."""
    df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.
    Safe to call at any time — releasing a cache that a later action still
    references only costs a recompute, never wrong results."""
    with _LOCK:
        handles = list(_TRACKED)
        _TRACKED.clear()
    for df in handles:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return len(handles)
