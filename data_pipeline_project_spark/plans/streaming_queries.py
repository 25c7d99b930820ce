"""Event-time window queries (SURVEY.md §7 M3 extension).

The reference has zero cross-file state (§2.6); these add the standard
streaming-analytics surface — tumbling windows, sliding windows, and
gap-based sessionization — expressed so the SAME plan runs in batch
(oracle-checkable) and under Structured Streaming with a watermark
(see streaming/event_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_project_spark.plans.registry import register
from data_pipeline_project_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "tumbling_window_agg",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows — identical plan streams with
    ``withWatermark('ts', ...)`` prepended."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )


@register(
    "sliding_window_agg",
    oracle="""
WITH offsets AS (SELECT unnest([0, 30]) AS off_min),
     slid AS (
       SELECT CAST(time_bucket(INTERVAL '1 hour',
                               ts - to_minutes(off_min)) + to_minutes(off_min) AS TIMESTAMP)
                  AS window_start,
              value
       FROM events, offsets
       WHERE ts >= CAST(time_bucket(INTERVAL '1 hour', ts - to_minutes(off_min))
                        + to_minutes(off_min) AS TIMESTAMP)
     )
SELECT window_start, count(*) AS n_events,
       round(avg(value), 6) AS avg_value
FROM slid GROUP BY 1
""",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1h length, 30min slide — each event lands in 2
    windows (Spark expands via its internal window generator; the
    oracle replicates with an explicit offset unnest)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


@register(
    "sessionization",
    oracle=f"""
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM marked
)
SELECT user_id, session_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30min inactivity) via lag + cumulative
    sum — the batch-exact equivalent of a streaming session window, and
    a single shuffle on user_id. (ts is unique per user in this data,
    so the cumulative-sum frame is deterministic.)"""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


WATERMARK_DELAY_MIN = 15
ARRIVAL_JITTER = 64


@register(
    "watermark_late_events",
    oracle=f"""
WITH arr AS (
    SELECT event_id, ts,
           event_id + (('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
                       % {ARRIVAL_JITTER}) AS arrival_key
    FROM events
), w AS (
    SELECT ts,
           max(ts) OVER (ORDER BY arrival_key, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS wm_base
    FROM arr
)
SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       count(CASE WHEN wm_base IS NOT NULL
                   AND ts < wm_base - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
             THEN 1 END) AS n_late_dropped,
       count(CASE WHEN wm_base IS NULL
                   OR ts >= wm_base - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
             THEN 1 END) AS n_kept
FROM w
GROUP BY 1
""",
)
def watermark_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, batch-expressible and therefore
    oracle-checkable (streaming/event_windows.watermark_late_flags):
    events replay in a deterministically hash-jittered arrival order
    (each event displaced up to 64 positions — simulated network
    reordering both engines compute identically), and an event is
    DROPPED iff its event time trails the running max event time of
    everything that arrived before it by more than 15 minutes — exactly
    ``withWatermark('ts', '15 minutes')``'s drop rule. Output is
    per-hour kept/dropped counts. The oracle's single sequential window
    is the semantics; the Spark side runs the bucketed two-phase
    prefix-max decomposition (the only single-partition step is over
    <= 4096 per-bucket aggregate rows), so parity also proves the
    decomposition equals the sequential running max."""
    import os

    from data_pipeline_project_spark.functions.positions import parquet_key_stats
    from data_pipeline_project_spark.operators.text import token_hash
    from data_pipeline_project_spark.streaming.event_windows import (
        watermark_late_flags,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts")
    arrival = F.col("event_id") + (
        token_hash(F.col("event_id").cast("string")) % ARRIVAL_JITTER
    )
    # Footer statistics give a COVERING arrival range for free (the
    # jitter only ever displaces forward, by < ARRIVAL_JITTER), which
    # removes the min/max job ahead of the main query.
    stats = parquet_key_stats(
        os.path.join(sf_dir, "events.parquet"), "event_id"
    )
    bounds = (
        (int(stats[0]), int(stats[1]) + ARRIVAL_JITTER)
        if stats is not None and stats[0] is not None
        else None
    )
    flagged = watermark_late_flags(
        ev,
        ts_col="ts",
        arrival_col=arrival,
        tiebreak_col="event_id",
        delay_seconds=WATERMARK_DELAY_MIN * 60,
        arrival_bounds=bounds,
    )
    return (
        flagged.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("is_late"), 1)).alias("n_late_dropped"),
            F.count(F.when(~F.col("is_late"), 1)).alias("n_kept"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_late_dropped", "n_kept")
    )
