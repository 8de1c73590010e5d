"""Tracked persistence for operator intermediates.

Several operators persist() an intermediate DataFrame that feeds
multiple subtrees of the returned plan (the capped shingle index, LSH
band tables, CC edge lists).  Spark frees cached partitions only at
executor-memory eviction or when the backing RDD is garbage-collected
on the JVM side — so a long-lived session invoking these operators
repeatedly accumulates cache entries.

``tracked_persist`` registers every such intermediate; callers that
run many operator invocations in one session (services, notebooks —
``bench.py`` uses ``spark.catalog.clearCache()`` instead, which also
works) release them deterministically with
``unpersist_tracked()`` once the consuming action has completed.
Unpersisting early is always SAFE (Spark recomputes the lineage), only
slower — so releasing between logical jobs is the recommended pattern.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: strong references — the JVM-side cache entry outlives the Python
#: wrapper, so a weakref would lose the handle needed to unpersist it
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() the DataFrame and register it for
    :func:`unpersist_tracked`.  MEMORY_AND_DISK default (spill-safe at
    scale, same as a bare ``persist()``)."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for
    :func:`unpersist_tracked` (for callers that persist incrementally —
    e.g. a fixpoint loop — and only know the final survivor)."""
    with _LOCK:
        _TRACKED.append(df)
    return df


def unpersist_tracked(blocking: bool = False) -> int:
    """Unpersist every operator intermediate registered since the last
    call; returns how many were released.  Safe to call at any time —
    plans still holding a released intermediate recompute it."""
    with _LOCK:
        dfs, _TRACKED[:] = list(_TRACKED), []
    n = 0
    for df in dfs:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def ensure_arrow(spark) -> None:
    """Turn on Arrow for driver<->executor columnar transfers.

    ``spark.sql.execution.arrow.pyspark.enabled`` defaults to FALSE in
    OSS PySpark (incl. 4.1), silently routing ``toPandas()`` /
    ``createDataFrame(pandas)`` through row-pickling — measured 7x
    slower at the 100k-row scale of the gated CC/ER transfers in this
    engine.  The key is runtime-settable, so every bounded driver
    transfer calls this first instead of trusting session builders."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
