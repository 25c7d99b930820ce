"""Parquet table loaders for the driver's synthetic star schema.

Tables per /root/repo/TESTDATA.md: TPC-H-ish star schema + events
stream table + documents/embeddings for the LLM-ops surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects unless read as long. Runtime-settable, so this also
        # covers driver-supplied sessions built without our factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as epoch-nanos LongType — convert to a true timestamp (values are
    # microsecond-aligned in the testdata, so the division is exact).
    for fld in df.schema.fields:
        if fld.name == "ts" and isinstance(fld.dataType, LongType):
            # integer div — a double division here loses precision at
            # epoch-nanos magnitude (2^53 < 1.7e18) and shifts values 1us
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NOTE: the testdata ships every table as single-row-group parquet,
    # so scans are unsplittable and run on one core. Measured both
    # ways: repartitioning documents/embeddings to session parallelism
    # made the doc-heavy queries 2-3x SLOWER at this scale — 32 tiny
    # partitions cost more in task + Python-worker round-trips than the
    # parallelism returns. At cluster scale real corpora arrive as many
    # files/row groups and the scan parallelizes on its own; don't
    # hand-repartition small inputs.
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() queries run."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def harmonize_union(spark_frames, renames=None, casts=None):
    """Union frames written under EVOLVED schemas into one logical
    frame: per-frame, ``renames`` maps old column names to current
    ones and ``casts`` coerces legacy types (e.g. an era that wrote
    int sensor readings); columns a frame lacks arrive as nulls
    (unionByName allowMissingColumns — additive evolution). The
    write-side counterpart of sinks/manifest.read_with_schema_evolution
    for when the eras live in DIFFERENT datasets (per-vendor drops,
    migrating pipelines) rather than one dir.

    Column ORDER never matters (by-name union), which is the bug this
    guards: plain union() matches by position and silently transposes
    values between same-typed columns."""
    from functools import reduce

    from pyspark.sql import functions as F

    fixed = []
    for df in spark_frames:
        for old, new in (renames or {}).items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        for col, typ in (casts or {}).items():
            if col in df.columns:
                df = df.withColumn(col, F.col(col).cast(typ))
        fixed.append(df)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), fixed
    )
