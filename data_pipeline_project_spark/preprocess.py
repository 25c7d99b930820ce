"""Batch preprocessing job — the reference's EP2
(preprocessing_kaggle_dataset.py:11-81) as one declarative Spark plan.

Reference flow: read Kaggle CSV (line 18) → rename headers (25-30) →
project (32-33) → round-robin sensor_id by row position (36) → UTC
parse + '%Y-%m-%d %H:%M:%S' format (38-40) → dropna (44-46) → write
5,000-row CSV chunks with headers (56-75).

Spark mapping (SURVEY.md §2.2 P1-P10, K7): withColumnsRenamed /
select / element_at-over-row_number / to_utc_timestamp + date_format /
na.drop / write.option("maxRecordsPerFile", n).csv. Chunk file NAMES
are Spark-controlled (not semantic); chunk SIZE and content contract
are preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_project_spark.functions.positions import with_row_position

# Kaggle weatherHistory.csv headers -> canonical names
# (preprocessing_kaggle_dataset.py:25-30).
RENAMES: dict[str, str] = {
    "Formatted Date": "timestamp",
    "Temperature (C)": "temperature",
    "Humidity": "humidity",
    "Pressure (millibars)": "pressure",
}

SENSOR_IDS = ("Kaggle_Weather_01", "Kaggle_Weather_02", "Kaggle_Weather_03")
CHUNK_ROWS = 5000
OUTPUT_COLUMNS = ("timestamp", "sensor_id", "temperature", "humidity", "pressure")


def preprocess_weather_frame(df: DataFrame) -> DataFrame:
    """P1-P8: rename -> project -> synthetic key -> UTC format -> dropna.

    Row position for the round-robin key (P7) is pinned to the UTC
    timestamp + source order tiebreak: 'file order' is not a
    Spark-scale concept, so the contract is deterministic-order, not
    byte-order parity with pandas.
    """
    present = {k: v for k, v in RENAMES.items() if k in df.columns}
    out = df.withColumnsRenamed(present)
    # P6 — parse with offset, normalize to UTC, second-precision format
    # (preprocessing_kaggle_dataset.py:39-40: pd.to_datetime(utc=True)
    # .strftime('%Y-%m-%d %H:%M:%S')).
    ts = F.coalesce(
        F.to_timestamp("timestamp", "yyyy-MM-dd HH:mm:ss.SSS XXX"),
        F.to_timestamp("timestamp", "yyyy-MM-dd HH:mm:ss"),
    )
    out = out.withColumn("_ts", ts)
    # Bucketed global row position (functions/positions.py) — a
    # partition-less Window.orderBy would collapse the table into one
    # task. unix_micros makes the timestamp a bigint range key; the raw
    # string breaks ties, matching the old (_ts, timestamp) ordering.
    out = with_row_position(
        out,
        F.unix_micros(F.col("_ts")),
        F.col("timestamp"),
        col_name="_rn",
        # the upstream is a CSV scan + pure projections — deterministic,
        # so the statistics jobs can rescan instead of caching
        persist=False,
    )
    out = (
        out.withColumn(
            "sensor_id",
            F.element_at(
                F.array(*[F.lit(s) for s in SENSOR_IDS]),
                ((F.col("_rn") - 1) % 3 + 1).cast("int"),
            ),
        )
        .withColumn("timestamp", F.date_format("_ts", "yyyy-MM-dd HH:mm:ss"))
        .select(*OUTPUT_COLUMNS)
        .na.drop("any", subset=list(OUTPUT_COLUMNS))
    )
    return out


def run_preprocess_job(
    spark: SparkSession,
    input_csv: str,
    output_dir: str,
    chunk_rows: int = CHUNK_ROWS,
) -> DataFrame:
    """EP2 end-to-end: CSV in, CHUNK_ROWS-row CSV chunks out (K7/P10 —
    write.option('maxRecordsPerFile') replaces the reference's iloc
    slicing loop, preprocessing_kaggle_dataset.py:56-75)."""
    df = spark.read.option("header", True).csv(input_csv)
    out = preprocess_weather_frame(df)
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("maxRecordsPerFile", chunk_rows)
        .csv(output_dir)
    )
    return out
