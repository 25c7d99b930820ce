"""Temporal-join queries — driver-checkable as-of and range joins over
the events stream (operators/temporal.py).

Both queries are exact and SQL-expressible, so they get full
hash-compare oracles: DuckDB's native ASOF JOIN for the as-of query,
and a plain non-equi predicate join for the range query (DuckDB plans
an IEJoin for it; our Spark side uses the bucketed equi rewrite — same
answer, shuffle-bounded plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.temporal import (
    asof_join,
    interval_range_join,
)
from data_pipeline_project_spark.plans.registry import register
from data_pipeline_project_spark.sources.tables import load_table


@register(
    "asof_join_last_click",
    oracle="""
SELECT p.event_id,
       p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       p.value AS purchase_value,
       CAST(c.ts AS TIMESTAMP) AS click_ts,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the same user's
    most recent click at-or-before the purchase (left-outer: purchases
    with no prior click keep nulls). Union-window rewrite — one hash
    shuffle on user_id, no join node; DuckDB's native ASOF JOIN is the
    oracle."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        right_cols=["click_value"],
        prefix="",
        ts_out="click_ts",
    )


@register(
    "range_join_error_windows",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       p.value AS purchase_value,
       e.event_id AS error_id,
       CAST(e.ts AS TIMESTAMP) AS error_ts
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.ts >= e.ts
 AND p.ts <= e.ts + INTERVAL 2 HOUR
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
""",
)
def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment: purchases landing inside a 2-hour window
    after any error by the same user (m:n pairs). Bucketed equi
    rewrite with bucket = window length, so each interval explodes to
    at most 3 buckets; the oracle states the raw non-equi predicate."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("_win_end"),
    )
    joined = interval_range_join(
        purchases,
        errors,
        point_ts="purchase_ts",
        start_ts="error_ts",
        end_ts="_win_end",
        on="user_id",
        bucket_seconds=7200,
    )
    return joined.select(
        "purchase_id", "user_id", "purchase_ts", "purchase_value", "error_id", "error_ts"
    )


# ---- interval-overlap join (deregistered-parity) ---------------------------

INTERVAL_OVERLAP_ORACLE = """
SELECT e.event_id AS error_id,
       e.user_id,
       CAST(e.ts AS TIMESTAMP) AS error_start,
       CAST(e.ts + INTERVAL 2 HOUR AS TIMESTAMP) AS error_end,
       p.event_id AS purchase_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_start,
       CAST(p.ts + INTERVAL 1 HOUR AS TIMESTAMP) AS purchase_end
FROM events e
JOIN events p
  ON e.user_id = p.user_id
 AND e.ts <= p.ts + INTERVAL 1 HOUR
 AND p.ts <= e.ts + INTERVAL 2 HOUR
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
"""


def interval_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-INTERVAL overlap (operators/temporal.interval_overlap_join):
    2-hour error-incident windows overlapping 1-hour purchase-session
    windows for the same user. The bucketed rewrite dedups pairs by
    keeping only the canonical (later-start) shared bucket — no wide
    DISTINCT; the oracle states the raw overlap predicate."""
    from data_pipeline_project_spark.operators.temporal import interval_overlap_join

    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("error_end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOURS")).alias("purchase_end"),
    )
    return interval_overlap_join(
        errors,
        purchases,
        l_start="error_start",
        l_end="error_end",
        r_start="purchase_start",
        r_end="purchase_end",
        on="user_id",
        bucket_seconds=7200,
    )


# ---- regular-grid resample + forward fill (deregistered-parity) -------------

RESAMPLE_FFILL_ORACLE = """
WITH obs AS (
    SELECT user_id, ts, max(value) AS value
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
    FROM obs GROUP BY 1
),
grid AS (
    SELECT b.user_id, g.grid_ts
    FROM bounds b,
         LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 6 HOUR))
                  AS grid_ts) g
)
SELECT grid.user_id, grid.grid_ts, obs.value AS value_ffill
FROM grid ASOF LEFT JOIN obs
  ON grid.user_id = obs.user_id AND grid.grid_ts >= obs.ts
"""


def resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-series resampling: per key, a regular 6-hour grid from
    the first observation's hour to the last observation, each grid
    point carrying the last observed value at or before it (LOCF) —
    null before the first observation, never fabricated. The dashboard/
    feature-store shape the reference's weather domain implies but its
    row-loop could never do at scale.

    Composition, not new machinery: the grid is a per-key
    ``sequence()`` explode (rows = time-span/step, independent of event
    count), and the fill is exactly :func:`operators.temporal.asof_join`
    backward — one shuffle of grid + observations, per-key windows.
    Observations are pre-reduced to (key, ts, max(value)) so ties at
    identical timestamps are deterministic in both engines."""
    from data_pipeline_project_spark.operators.temporal import asof_join

    ev = load_table(spark, "events", sf_dir)
    obs = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    bounds = obs.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))
        ).alias("grid_ts"),
    )
    out = asof_join(
        grid,
        obs,
        on="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        right_cols=["value"],
        direction="backward",
        prefix="",
        ts_out="_obs_ts",
    )
    return out.select("user_id", "grid_ts", F.col("value").alias("value_ffill"))


# ---- Sensor gap detection (deregistered-parity) -----------------------------

SENSOR_GAP_ORACLE = """
WITH seq AS (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
)
SELECT user_id,
       strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS gap_start,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
       CAST(date_diff('second', prev_ts, ts) // 60 AS BIGINT) AS gap_minutes
FROM seq
WHERE prev_ts IS NOT NULL AND date_diff('second', prev_ts, ts) // 60 > 1440
"""


def sensor_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-gap detection over the event stream — the monitoring query
    every sensor/ingest pipeline runs ("which feeds went silent, and
    for how long"): per user, consecutive-event pairs more than 24h
    apart, with the gap's endpoints and its length in minutes. One
    window shuffle on user_id (full tie-break on (ts, event_id) — ts
    alone is not a total order). Timestamps are emitted as formatted
    strings, and the minute difference is floor(elapsed-seconds / 60)
    spelled explicitly in BOTH engines — DuckDB's date_diff('minute')
    counts minute-BOUNDARY crossings, not elapsed minutes, and the two
    disagree by one for sub-minute offsets."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    gap_min = F.expr(
        "(unix_timestamp(ts) - unix_timestamp(prev_ts)) div 60"
    )
    return (
        seq.where(F.col("prev_ts").isNotNull() & (gap_min > 1440))
        .select(
            "user_id",
            F.date_format("prev_ts", "yyyy-MM-dd HH:mm:ss").alias("gap_start"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("gap_end"),
            gap_min.alias("gap_minutes"),
        )
    )


# ---- State-change compression (deregistered-parity) -------------------------

STATE_CHANGE_ORACLE = """
WITH seq AS (
    SELECT user_id, ts, event_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (prev_type IS NULL OR event_type <> prev_type) AS BIGINT)
           AS n_changes
FROM seq GROUP BY user_id
"""


def state_change_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length (state-change) compression of an event stream: keep
    only rows where the state differs from the user's previous state —
    the CDC change-detection shape that turns an append-only reading
    log into a compact transition log (at 100 TB, repeated-state
    readings are the bulk of sensor data and this is the standard
    pre-aggregation compression). Summarized per user as total events
    vs surviving transitions; one window + one aggregate, both keyed on
    user_id so the second shuffle is elided (same partitioning)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    is_change = F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(is_change, 1).otherwise(0)).cast("bigint").alias("n_changes"),
    )


# ---- OHLC time bars (deregistered-parity) -----------------------------------

OHLC_BARS_ORACLE = """
WITH b AS (
  SELECT user_id, CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS bucket,
         value,
         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '6 hours', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '6 hours', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       count(*) AS n_events,
       round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close
FROM b GROUP BY user_id, bucket
"""


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the time-series downsampling every
    metrics/trading pipeline runs: per (user, 6-hour bucket), the
    first (open), max (high), min (low), and last (close) observed
    value. First/last are defined by the FULL tie-broken event order
    (ts, event_id) — "first value in the bucket" under a partial order
    is nondeterministic, which is exactly the bug class this pins.
    Implemented as two row_number windows sharing ONE (user, bucket)
    shuffle with the bar aggregate, not per-row sorts; at scale this
    is a single exchange keyed by the same columns the output groups
    by."""
    ev = load_table(spark, "events", sf_dir)
    b = ev.select(
        "user_id",
        F.window("ts", "6 hours").start.alias("bucket"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = b.select(
        "user_id",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        marked.groupBy("user_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
        )
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )


# ---- Linear interpolation resampling (deregistered-parity) ------------------

RESAMPLE_INTERP_ORACLE = """
WITH obs AS (
    SELECT user_id, ts, max(value) AS value FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
    FROM obs GROUP BY 1
),
grid AS (
    SELECT b.user_id, g.grid_ts
    FROM bounds b,
         LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 6 HOUR))
                  AS grid_ts) g
),
bwd AS (
    SELECT grid.user_id, grid.grid_ts, obs.value AS pv, obs.ts AS pts
    FROM grid ASOF LEFT JOIN obs
      ON grid.user_id = obs.user_id AND grid.grid_ts >= obs.ts
),
fwd AS (
    SELECT bwd.*, o2.value AS nv, o2.ts AS nts
    FROM bwd ASOF LEFT JOIN obs o2
      ON bwd.user_id = o2.user_id AND bwd.grid_ts <= o2.ts
)
SELECT user_id, strftime(grid_ts, '%Y-%m-%d %H:%M:%S') AS grid_time,
       round(CASE
         WHEN pts IS NULL OR nts IS NULL THEN NULL
         WHEN pts = nts THEN pv
         ELSE pv + (nv - pv) * ((epoch(grid_ts) - epoch(pts))
                                / (epoch(nts) - epoch(pts)))
       END, 6) AS value_interp
FROM fwd
"""


def resample_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling — the second member of the
    resampling family beside LOCF (resample_forward_fill): each 6-hour
    grid point gets the straight-line value between its nearest
    observation at-or-before and at-or-after. A grid point sitting
    exactly on an observation returns that observation (both as-of
    joins land on it); a point before the first or after the last
    observation is NULL — interpolation never extrapolates. Two as-of
    joins (backward then forward) over the same pre-reduced observation
    table; both are the union-window single-exchange rewrite, so the
    plan carries two key-partitioned windows and no join node. The
    interpolation arithmetic is spelled identically in both engines
    (epoch-seconds ratio), so even the float metric hash-checks."""
    from data_pipeline_project_spark.operators.temporal import asof_join

    ev = load_table(spark, "events", sf_dir)
    obs = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    bounds = obs.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))).alias("grid_ts"),
    )
    bwd = asof_join(
        grid, obs, on="user_id", left_ts="grid_ts", right_ts="ts",
        right_cols=["value"], direction="backward", prefix="p_", ts_out="pts",
    ).withColumnRenamed("p_value", "pv")
    fwd = asof_join(
        bwd, obs, on="user_id", left_ts="grid_ts", right_ts="ts",
        right_cols=["value"], direction="forward", prefix="n_", ts_out="nts",
    ).withColumnRenamed("n_value", "nv")
    # timestamp -> double = fractional epoch seconds (events carry
    # sub-second components; unix_timestamp would truncate them while
    # DuckDB's epoch() keeps them — measured 2.5e-3 relative drift).
    def _sec(c):
        # NTZ doesn't cast to double directly; via TIMESTAMP it becomes
        # fractional epoch seconds. The session-TZ offset is the same
        # additive constant in every term, so the ratio is unaffected.
        return F.col(c).cast("timestamp").cast("double")

    frac = (_sec("grid_ts") - _sec("pts")) / (_sec("nts") - _sec("pts"))
    interp = (
        F.when(F.col("pts").isNull() | F.col("nts").isNull(), F.lit(None))
        .when(F.col("pts") == F.col("nts"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return fwd.select(
        "user_id",
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_time"),
        F.round(interp, 6).alias("value_interp"),
    )
