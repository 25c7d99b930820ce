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
