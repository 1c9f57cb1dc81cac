"""Tracked persists: query builders that must leave cached intermediates
alive (the frames they return are lazy and still reference them) register
those here, so long-lived sessions can release them explicitly instead of
leaning on the LRU block manager.

One-shot harnesses (the bench, the driver) get the same effect from
``spark.catalog.clearCache()``; the hook exists for sessions that run many
dedup/ANN queries back to back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted frame for later release; returns it unchanged."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (call AFTER collecting results from
    the queries that created them); returns the number released."""
    n = len(_TRACKED)
    while _TRACKED:
        _TRACKED.pop().unpersist()
    return n
