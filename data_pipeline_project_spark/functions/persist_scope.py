"""Query-scoped persist bookkeeping.

Query builders persist intermediates that several branches of one plan
consume (a MinHash signature table feeding both sides of a self-join,
the (doc, term) aggregate feeding tf/df/n_docs). The builder cannot
unpersist them itself: it returns an UNEXECUTED DataFrame, and the
driver/bench materializes it later — unpersisting inside the builder
would drop the cache before it is ever used.

Left alone, those blocks accumulate for the session's lifetime when
many queries run in one session (driver: 50 queries; bench: 50 x 3
passes). ``scoped_persist`` registers each persist in a module-level
scope, and the query registry releases the scope when the NEXT query is
built — by then the previous query's result has been materialized
(build -> execute -> build is the contract of every consumer: driver,
bench, oracle-parity tests). At most one query's persists are live at a
time, and a re-built query recomputes honestly instead of silently
reusing the previous pass's cache.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() plus registration in the current query scope."""
    df.persist(level)
    _SCOPED.append(df)
    return df


def release_scoped_persists() -> int:
    """Unpersist everything registered since the last release; returns
    the number of frames released. Blocking=False: eviction proceeds in
    the background, the next query need not wait on it."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # noqa: BLE001 — a dead session must not wedge release
            pass
    return n
