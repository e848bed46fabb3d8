"""Tracked persist: operators persist intermediates that feed multiple
subtrees (LSH bucket frames, shingle sets, hyperplane signatures), but a
long-lived session running many queries would otherwise accumulate
cached blocks until eviction pressure. Operators route persist() through
``persist_tracked``; hosts with query-at-a-time lifecycles (bench.py,
the correctness driver) call ``release_all`` between queries. A host
that never releases simply falls back to Spark's LRU block eviction —
correct, just less tidy.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
        df: DataFrame,
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """persist() that records the frame for later ``release_all``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame (blocking=False); returns how many."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped; nothing to release
    _TRACKED.clear()
    return n
