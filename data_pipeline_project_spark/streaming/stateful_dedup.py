"""Streaming first-seen dedup with TTL state (custom stateful operator).

The ingest problem this solves: a document stream carries occasional
re-sends (retries, replayed partitions, repeated crawls); downstream
wants each content hash exactly once per retention window. Keyed state
holds one flag per content hash; a processing-time timeout expires
state for hashes not seen within the window, bounding the state store
by the window's UNIQUE hash count rather than stream lifetime — the
property that keeps a 100 TB/day ingest's state flat.

Implemented on ``applyInPandasWithState`` (Arrow-batched per-key state,
RocksDB-backed on a real cluster). Spark 4's successor API
(``transformWithStateInPandas`` — typed state handles, native TTL) is
the mechanical port once its protobuf dependency is available in the
runtime; the semantics below are identical (value state + TTL).

Contrast with streaming/corpus_ingest.py (Bloom + broadcast against the
historical corpus — cross-RUN dedup): this is the IN-FLIGHT cross-batch
dedup a long-running stream needs, using the engine's own state store
instead of an operator-managed sketch. No reference counterpart (the
reference dedups FILE names in a Python set, `pipeline.py:362-372`
recently_processed); this is the row-level streaming twin of that idea.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_OUT_SCHEMA = "content_hash string, doc_id bigint, text string"
DEDUP_STATE_SCHEMA = "seen boolean"


def dedup_stream_first_seen(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_hours: int = 24,
) -> DataFrame:
    """Emit only the FIRST row seen per content hash (md5 of the text);
    re-sends within ``ttl_hours`` of processing time are dropped, after
    which the hash's state expires and the next arrival passes again
    (the retention-window contract). Within one micro-batch the winner
    is deterministic: lowest ``id_col``.

    Append output mode: a key emits at most one row ever (per TTL
    window), so results are final on emission — the exactly-once shape
    a downstream corpus writer wants.

    Drain caveat: ``trigger(availableNow=True)`` NEVER self-terminates
    on this operator — with ProcessingTimeTimeout,
    FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
    true (a timer might fire as processing time advances), so the
    engine schedules empty micro-batches forever. A bounded drain must
    watch progress and ``stop()`` the query once input is consumed
    (tests/test_streaming.py::_drain_stateful); on a production stream
    this never matters because the query is meant to run forever.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # Already emitted within the TTL window: refresh the
            # timeout (sliding retention) and drop everything.
            for _ in pdfs:
                pass
            state.setTimeoutDuration(ttl_hours * 3600 * 1000)
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values("doc_id").head(1)
            if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
                first = cand
        if first is not None:
            state.update((True,))
            state.setTimeoutDuration(ttl_hours * 3600 * 1000)
            yield first[["content_hash", "doc_id", "text"]]

    keyed = docs.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
