"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same configs are the ones that matter
on a 1000-executor cluster: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for any pandas-UDF path, a shuffle
partition count that AQE can coalesce down from.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tunables that hold at scale: AQE re-plans shuffles at runtime (skew
# splitting, empty-partition coalescing); advisory partition size keeps
# post-shuffle partitions near 64MB so they fit executor memory at any SF.
_BASE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # Driver testdata stores events.ts as TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects; read as long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "data_pipeline_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the driver's bench and local tests share one code path. On a real
    cluster the caller passes no master and spark-submit supplies it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: match cores, not the 200 default — AQE coalesces
        # further. On a cluster this should be ~2-3x total cores.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _BASE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master.startswith("local"):
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
