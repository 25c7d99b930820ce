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
