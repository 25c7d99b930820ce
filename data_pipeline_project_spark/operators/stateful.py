"""Custom stateful operators (no native Spark equivalent).

EWMA is a linear recurrence (ewma_t = a*x_t + (1-a)*ewma_{t-1}) —
inexpressible as a window aggregate without an overflow-prone 2^t
closed form — so it runs as grouped-map pandas: Arrow-batched, one
group per key, sorted in-group. At 100 TB the shuffle is one
hash-partition on the key and the per-group work is a sequential
vectorized scan; skewed keys are the only hazard (mitigate upstream by
splitting hot keys into time ranges and stitching the boundary state).

The streaming twin keeps (ewma, last_ts) per key in
``applyInPandasWithState`` with processing-time timeout, emitting one
updated row per key per micro-batch — the Structured Streaming shape
for custom per-key state the reference's whole-file micro-batching
never needed (SURVEY.md §2.6).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("ewma", T.DoubleType()), T.StructField("n", T.LongType())]
)

EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _round6(x: float) -> float:
    # Half-away-from-zero via x*1e6, matching SQL round() — Python's
    # built-in round is banker's, and a halving recurrence lands on
    # exact .5 ties at the 6th decimal constantly.
    y = x * 1e6
    return math.copysign(math.floor(abs(y) + 0.5), y) / 1e6


def ewma(
    events: DataFrame,
    alpha: float = 0.5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key time-ordered EWMA (adjust=False recurrence, seeded with
    the first observation).

    Shape: hash-repartition on the key + secondary sort within
    partitions, then ONE Arrow-batched Python call per partition
    (mapInPandas) that walks the sorted rows carrying state across both
    group and batch boundaries. groupBy().applyInPandas would make one
    Python call per key — with many small keys that round-trip overhead
    dominates (measured ~10x here); per-partition streaming is also the
    shape that holds at 100 TB, where keys are numerous and small.
    """

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Sorted within the partition => each key is contiguous, but a
        # key may span Arrow batches: carry (prev_key, cur) across.
        prev_key, cur = object(), None
        for pdf in batches:
            vals = pdf[value_col].astype("float64").to_numpy()
            keys = pdf[key_col].to_numpy()
            smoothed = []
            for k, v in zip(keys, vals):
                if k != prev_key:
                    prev_key, cur = k, None
                cur = v if cur is None else alpha * v + (1 - alpha) * cur
                smoothed.append(_round6(cur))
            yield pd.DataFrame(
                {
                    "user_id": keys,
                    "ts": pdf[ts_col],
                    "value": vals,
                    "ewma": smoothed,
                }
            )

    part = (
        events.select(key_col, ts_col, value_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, ts_col, value_col)
    )
    return part.mapInPandas(per_partition, schema=EWMA_SCHEMA)


def streaming_ewma(
    events: DataFrame,
    alpha: float = 0.5,
    timeout_minutes: int = 30,
) -> DataFrame:
    """Streaming per-key EWMA with explicit state: one output row per
    key per micro-batch carrying the running smoothed value and count.
    State is (ewma, n); an idle key's state expires after
    ``timeout_minutes`` of processing time (emitting nothing).

    Drain caveat: as with streaming/stateful_dedup.py, the
    ProcessingTimeTimeout makes ``availableNow`` unable to
    self-terminate (shouldRunAnotherBatch is unconditionally true);
    bounded runs must watch progress and stop() explicitly
    (tests/test_streaming.py::_drain_stateful)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for v in pdf["value"].astype("float64"):
                cur = v if cur is None else alpha * v + (1 - alpha) * cur
                n += 1
        state.update((cur, n))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"user_id": [key[0]], "ewma": [cur], "n": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
