"""Queries mirroring the reference pipeline's semantics (SURVEY.md §2.3/§2.4).

The driver's oracle harness runs on the synthetic parquet tables, so the
reference's sensor semantics are exercised on `events`
(user_id ≈ sensor_id, ts ≈ timestamp, value ≈ reading — FIXTURES.md §4)
and `lineitem` (3 numeric metrics, mirroring temperature/humidity/
pressure). The raw-CSV reader path (S5-S7, F1-F8 on real CSV files) is
covered by pytest fixtures in tests/ — parquet tables can't exercise a
CSV reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.aggregates import long_format_stats
from data_pipeline_project_spark.plans.registry import register
from data_pipeline_project_spark.sources.tables import load_table

# Bounds for the events-table validation fixtures: value must lie in
# [VAL_LO, VAL_HI] (mirrors temperature ∈ [TEMP_MIN, TEMP_MAX],
# reference config.ini:15-16). 200.0 splits sf0.01 users ~47 clean /
# ~103 dirty, so the strict gate's anti-join is non-trivially exercised.
VAL_LO, VAL_HI = 0.0, 200.0


@register(
    "sensor_stats_long",
    oracle="""
WITH long AS (
    SELECT l_returnflag, l_linestatus, l_shipdate,
           'l_quantity' AS metric_name, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_returnflag, l_linestatus, l_shipdate,
           'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_returnflag, l_linestatus, l_shipdate,
           'l_discount', l_discount FROM lineitem
)
SELECT l_returnflag, l_linestatus, metric_name,
       min(value) AS min_value,
       max(value) AS max_value,
       round(avg(value), 6) AS avg_value,
       round(coalesce(stddev_samp(value), 0.0), 6) AS std_dev_value,
       count(value) AS record_count,
       min(l_shipdate) AS aggregation_time
FROM long
GROUP BY l_returnflag, l_linestatus, metric_name
HAVING count(value) > 0
""",
)
def sensor_stats_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — the reference's one true query (pipeline.py:186-208):
    per-group, per-metric long-format min/max/avg/stddev/count with the
    n<=1→0.0 stddev edge and min-timestamp aggregation_time, as one
    unpivot + one hash aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    return long_format_stats(
        li,
        group_cols=["l_returnflag", "l_linestatus"],
        metric_cols=["l_quantity", "l_extendedprice", "l_discount"],
        time_col="l_shipdate",
        round_decimals=6,
    )


@register(
    "strict_file_gate",
    oracle=f"""
SELECT e.event_id, e.user_id, e.event_type, e.value
FROM events e
WHERE e.user_id NOT IN (
    SELECT user_id FROM events
    WHERE value IS NULL OR value < {VAL_LO} OR value > {VAL_HI}
       OR event_type IS NULL
)
""",
)
def strict_file_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — strict all-or-nothing gate (pipeline.py:161-165, 310-315):
    one bad row poisons its whole unit (user_id plays file_name); valid
    rows of a poisoned unit are discarded. Left-anti join against the
    distinct bad-unit set — at 100 TB the bad-unit set is tiny and
    broadcasts."""
    ev = load_table(spark, "events", sf_dir)
    bad = F.col("value").isNull() | (F.col("value") < VAL_LO) | (F.col("value") > VAL_HI) | F.col("event_type").isNull()
    bad_units = ev.where(bad).select("user_id").distinct()
    return ev.join(F.broadcast(bad_units), "user_id", "left_anti").select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "row_error_reasons",
    oracle=f"""
SELECT event_id,
       concat_ws('; ',
           CASE WHEN event_type IS NULL THEN '''event_type'' is null.' END,
           CASE WHEN value IS NULL THEN '''value'' is null.'
                WHEN value < {VAL_LO} OR value > {VAL_HI}
                THEN concat('''value'' (', CAST(value AS VARCHAR),
                            ') is out of range [{VAL_LO}, {VAL_HI}].')
           END
       ) AS error_reason
FROM events
WHERE value IS NULL OR value < {VAL_LO} OR value > {VAL_HI}
   OR event_type IS NULL
""",
)
def row_error_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — per-row error-reason strings in the reference's format
    ("'col' (value) is ..."; reasons joined with '; ',
    pipeline.py:117-164), built columnar with concat_ws over
    conditionally-null message parts."""
    ev = load_table(spark, "events", sf_dir)
    null_type_msg = F.when(F.col("event_type").isNull(), F.lit("'event_type' is null."))
    value_msg = F.when(F.col("value").isNull(), F.lit("'value' is null.")).when(
        (F.col("value") < VAL_LO) | (F.col("value") > VAL_HI),
        F.concat(
            F.lit("'value' ("),
            F.col("value").cast("string"),
            F.lit(f") is out of range [{VAL_LO}, {VAL_HI}]."),
        ),
    )
    return (
        ev.withColumn("error_reason", F.concat_ws("; ", null_type_msg, value_msg))
        .where(F.col("error_reason") != "")
        .select("event_id", "error_reason")
    )
