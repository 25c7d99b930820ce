"""Event-time windowed aggregation under Structured Streaming.

The batch twins in plans/streaming_queries.py are these exact plans
minus the watermark; here the watermark bounds state (and drops late
rows) so the same aggregation runs indefinitely on an unbounded
stream. Append output mode emits a window only once its end passes the
watermark — the finalized-result contract a downstream table wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time windows with a watermark: rows later than
    the watermark are dropped, per-window state is freed once the
    watermark passes the window end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_event_counts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via ``session_window``: per key, events
    within ``gap`` of each other merge into one growing session window
    [first_ts, last_ts + gap). The streaming twin of the batch
    sessionization query (plans/streaming_queries.py — lag + cumulative
    gap-count), but with state Spark manages: a session is held open
    while events can still extend it and emitted exactly once, when the
    watermark passes its end. State per key is O(open sessions), not
    O(events) — the property that lets this run forever at 100 TB
    scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "avg_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each key,
    suppress re-deliveries within the watermark horizon. This is the
    ingest-time guard a training-data pipeline puts in front of
    storage (at-least-once sources re-deliver; state is bounded by the
    watermark, unlike an unbounded dropDuplicates)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def stream_stream_window_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "2 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each left row pairs with right rows of
    the same key whose timestamp falls in ``[left_ts - lookback,
    left_ts]`` — the streaming twin of
    ``operators/temporal.interval_range_join`` (e.g. purchases joined
    to the clicks that preceded them while both are live streams).

    State management is the whole game here: without a time bound a
    stream-stream join buffers both streams forever. The watermark on
    BOTH inputs plus the range condition lets Spark evict a buffered
    row as soon as the other stream's watermark passes its last
    possible match — steady-state memory is O(key-rate x (lookback +
    watermark)), not O(stream length).

    Column names must be disjoint apart from ``on`` (alias upstream).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] <= F.col(left_ts))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])


def stream_stream_window_join_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "2 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join — same windowed-match semantics as
    :func:`stream_stream_window_join`, but a left row with NO match is
    still emitted (right columns null). The subtlety the inner variant
    doesn't have: the null row can only be emitted once the RIGHT
    stream's watermark has passed the left row's entire match window —
    until then a match could still arrive — so unmatched results trail
    the data by (lookback + watermark), and a drained availableNow run
    only emits the null rows whose windows the final watermark closed.
    That is the correct streaming answer, not a bug: pinned by
    tests/test_streaming.py."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] <= F.col(left_ts))
    )
    return lw.join(rw, cond, "left_outer").drop(rw[on])


def watermark_late_flags(
    events: DataFrame,
    ts_col: str = "ts",
    arrival_col: str | F.Column = "event_id",
    tiebreak_col: str = "event_id",
    delay_seconds: int = 600,
    n_buckets: int = 4096,
    late_col: str = "is_late",
    arrival_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """BATCH twin of Structured Streaming's watermark drop rule: flag
    each event as late iff its event time is more than
    ``delay_seconds`` behind the maximum event time of everything that
    ARRIVED strictly before it (``withWatermark(ts, delay)`` drops
    exactly these rows, modulo micro-batch boundaries — the streaming
    watermark only advances between batches, so the batch flag is the
    tightest per-row refinement of it). Batch-expressible means
    oracle-checkable: a SQL window over arrival order pins the
    semantics the streaming path is trusted with.

    ``arrival_col`` is the arrival-order key (a column name or
    expression — e.g. a hash-jittered event id to replay network
    reordering deterministically); ties break on ``tiebreak_col``,
    which must make the pair unique.

    Scale shape: the naive form is ONE global window over arrival
    order — a single-partition sort of the whole table. This runs the
    two-phase decomposition instead (same trick as
    functions/positions.with_row_position): range-bucket the arrival
    key (one bounded min/max job), take per-bucket max event time, run
    the prefix max over the <= ``n_buckets`` AGGREGATE rows (the only
    single-partition step, bounded by bucket count, never data), and
    combine with a per-bucket running max (hash-partitioned, parallel).
    greatest(prefix-of-previous-buckets, running-max-within-bucket) is
    exactly the sequential running max.

    ``arrival_bounds``: optional (lo, hi) COVERING range of the arrival
    key (inclusive; wider is fine — only bucket granularity changes,
    never correctness) — e.g. from parquet footer statistics. Supplying
    it removes the min/max job ahead of the main query.
    """
    from data_pipeline_project_spark.functions.persist_scope import scoped_persist
    from data_pipeline_project_spark.operators.temporal import _epoch_us

    arr = (
        F.col(arrival_col) if isinstance(arrival_col, str) else arrival_col
    ).cast("bigint")
    # Materialize once: the per-bucket max aggregate AND the main join
    # both consume this frame — unpersisted, the scan plus the arrival
    # hash expression run twice (r13).
    keyed = scoped_persist(
        events.withColumn("_wm_arr", arr).withColumn(
            "_wm_ts", _epoch_us(F.col(ts_col))
        )
    )

    if arrival_bounds is not None:
        lo, hi = int(arrival_bounds[0]), int(arrival_bounds[1])
    else:
        stats = keyed.agg(
            F.min("_wm_arr").alias("lo"), F.max("_wm_arr").alias("hi")
        ).first()
        if stats is None or stats["lo"] is None:
            return events.withColumn(late_col, F.lit(False))
        lo, hi = int(stats["lo"]), int(stats["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)
    keyed = keyed.withColumn(
        "_wm_bucket", ((F.col("_wm_arr") - F.lit(lo)) / F.lit(width)).cast("bigint")
    )

    from pyspark.sql import Window

    bmax = keyed.groupBy("_wm_bucket").agg(F.max("_wm_ts").alias("_wm_bmax"))
    w_prev_buckets = Window.orderBy("_wm_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = bmax.select(
        "_wm_bucket", F.max("_wm_bmax").over(w_prev_buckets).alias("_wm_prev")
    )

    w_in_bucket = (
        Window.partitionBy("_wm_bucket")
        .orderBy("_wm_arr", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = keyed.join(F.broadcast(prev), "_wm_bucket")
    # greatest() skips nulls: null only when NOTHING arrived before
    # (the first event overall), which is never late by definition.
    wm_base = F.greatest(F.max("_wm_ts").over(w_in_bucket), F.col("_wm_prev"))
    late = wm_base.isNotNull() & (
        F.col("_wm_ts") < wm_base - F.lit(int(delay_seconds) * 1_000_000)
    )
    return joined.withColumn(late_col, late).drop(
        "_wm_arr", "_wm_ts", "_wm_bucket", "_wm_prev"
    )


def ohlc_bars_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "6 hours",
    watermark: str | None = None,
) -> DataFrame:
    """OHLC bars as ONE aggregate — the STREAMING-compatible plan. The
    batch query (plans/temporal_queries.ohlc_bars) uses two row_number
    windows, which Structured Streaming cannot run; min_by/max_by over
    a total-order struct (ts, monotonic tiebreak via the value row's
    own ordering columns) express first/last inside a plain aggregate,
    which streams under a watermark and also saves the batch plan a
    whole window pass. Ties are broken by the full (ts, value) struct
    order, so the bars are deterministic under any partitioning.

    With ``watermark`` set, the input must be a streaming frame; the
    same code path runs batch when it is None — streaming = batch, the
    engine's core promise."""
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    ordkey = F.struct(F.col(ts_col), F.col(value_col))
    return (
        src.groupBy(F.col(key_col), F.window(ts_col, bucket).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min_by(value_col, ordkey), 6).alias("open"),
            F.round(F.max(value_col), 6).alias("high"),
            F.round(F.min(value_col), 6).alias("low"),
            F.round(F.max_by(value_col, ordkey), 6).alias("close"),
        )
        .select(
            key_col,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )
