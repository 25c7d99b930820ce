"""Lakehouse-catalog queries for the driver board (r11).

The driver harness reads parquet at sf_dir and compares a Spark
DataFrame against DuckDB SQL — a window that, until now, could not
reach the manifest tier. ``stats_catalog_parity`` closes that: the
Spark side BUILDS a real manifest table from the sf tables (range-
clustered write + versioned commit — the same code path every
lakehouse op uses), then answers rowcount / per-column min / max /
null-count ENTIRELY FROM THE LOG (table_column_minmax,
snapshot_rowcount, the per-entry stats index) with zero data reads;
the oracle recomputes the same numbers with a full DuckDB scan. A
hash mismatch means the stats-in-the-log index — the thing every
zone-map prune, targeted merge plan, and metadata-only COUNT trusts
— recorded wrong numbers at commit time. This puts the commit path
itself under the driver's correctness gate.

Reference parity note: the reference has no catalog tier (it scans
single CSVs, pipeline.py); this row guards the extension tier's
foundational invariant instead — stats recorded at write time equal
a recompute, at any scale, because both are per-file footer facts
merged associatively.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_project_spark.plans.registry import register
from data_pipeline_project_spark.plans.sensor_queries import load_table

_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
)

_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       count(*)::BIGINT AS n_rows,
       round(min({c})::DOUBLE, 6) AS min_value,
       round(max({c})::DOUBLE, 6) AS max_value,
       (count(*) - count({c}))::BIGINT AS null_count
FROM lineitem"""
    for c in _COLS
)


@register("stats_catalog_parity", oracle=_ORACLE)
def stats_catalog_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a manifest table from lineitem, then answer its column
    statistics FROM THE LOG ALONE — the oracle recomputes by scanning.
    The temp table is deleted before returning (the result is a local
    frame of catalog answers; nothing lazy references the files)."""
    from data_pipeline_project_spark.sinks.layout import (
        write_range_clustered,
    )
    from data_pipeline_project_spark.sinks.manifest import (
        read_manifest,
        snapshot_rowcount,
        table_column_minmax,
        write_versioned_manifest,
    )

    li = load_table(spark, "lineitem", sf_dir).select(*_COLS)
    work = tempfile.mkdtemp(prefix="stats_catalog_")
    path = os.path.join(work, "t")
    # bootstrap (write_versioned_manifest) is metadata-only by
    # contract, so no NDV gating is needed — and as of r12 the gate is
    # a commit_optimistic PARAMETER (collect_ndv=False), never a
    # module-global flip a concurrent commit could observe
    try:
        write_range_clustered(li, path, "l_orderkey", 4)
        write_versioned_manifest(path)

        n_rows = snapshot_rowcount(path)
        m = read_manifest(os.path.join(path, "_manifests", "latest.json"))
        rows = []
        for c in _COLS:
            rng = table_column_minmax(path, c)
            if rng is None:
                raise RuntimeError(
                    f"stats coverage hole for {c!r} — every commit must "
                    f"record stats for primitive columns"
                )
            nulls = 0
            for f in m["files"]:
                st = (f.get("stats") or {}).get(c)
                if st is None or len(st) < 4:
                    raise RuntimeError(
                        f"null-count missing for {c!r} in {f['path']}"
                    )
                nulls += st[3]
            rows.append(
                (
                    c,
                    n_rows,
                    round(float(rng[0]), 6),
                    round(float(rng[1]), 6),
                    nulls,
                )
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "col_name string, n_rows long, min_value double, "
        "max_value double, null_count long",
    )


# fixture slice: one month of orders (month era: 1 dir, day era: ~31
# dirs — the eras interleave by ORDERKEY, so every window overlaps
# both); the probe window sits strictly inside the slice so the
# oracle's plain WHERE over the FULL orders table selects exactly the
# same rows
_ERA_SLICE_LO, _ERA_SLICE_HI = "1995-03-01", "1995-03-31"
_ERA_LO, _ERA_HI = "1995-03-05 00:00:00", "1995-03-25 00:00:00"

_ERA_ORACLE = f"""
SELECT o_orderpriority AS priority,
       count(*)::BIGINT AS n_orders,
       (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS sum_price
FROM orders
WHERE o_orderdate::TIMESTAMP >= TIMESTAMP '{_ERA_LO}'
  AND o_orderdate::TIMESTAMP <= TIMESTAMP '{_ERA_HI}'
GROUP BY 1
"""


@register("era_mixed_time_range", oracle=_ERA_ORACLE)
def era_mixed_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-evolution reads under the driver's hash gate (r12
    registry swap, in for training_shard_assignment): build a time-
    partitioned manifest table from orders where HALF the rows land
    under a month-granularity era and half under a day era after a
    metadata-only set_partition_granularity, then answer a time-range
    aggregate THROUGH read_time_range — one lexicographic range on
    the derived column prunes BOTH eras' directories, the residual
    timestamp predicate trims the bounds. The oracle recomputes from
    the raw orders rows with a plain WHERE: equality proves era-mixed
    pruned reads are a plan optimization, never a semantic one.

    Scale posture: the spec change is metadata-only (zero files move),
    pruning cost is O(manifest), and the residual filter pushes into
    the scan. Reference scope: the reference has no partitioned
    storage (single-CSV scans); this row guards the extension tier.

    Sums are decimal-cast on BOTH engines (exact, order-independent)
    before the final double cast — the cross-engine float-sum gotcha.
    """
    from data_pipeline_project_spark.sinks.layout import (
        write_time_partitioned,
    )
    from data_pipeline_project_spark.sinks.manifest import (
        append_time_partitioned,
        read_time_range,
        set_partition_granularity,
        table_partition_spec,
        write_versioned_manifest,
    )

    o = (
        load_table(spark, "orders", sf_dir)
        .where(
            F.col("o_orderdate").between(
                F.lit(_ERA_SLICE_LO), F.lit(_ERA_SLICE_HI)
            )
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.col("o_orderdate").cast("timestamp").alias("ts"),
        )
    )
    era1 = o.where(F.col("o_orderkey") % 3 != 0)
    era2 = o.where(F.col("o_orderkey") % 3 == 0)
    work = tempfile.mkdtemp(prefix="era_mixed_")
    path = os.path.join(work, "t")
    try:
        write_time_partitioned(era1, path, "ts", "month")
        write_versioned_manifest(path)
        set_partition_granularity(spark, path, "ts", "month")
        set_partition_granularity(spark, path, "ts", "day")
        append_time_partitioned(spark, path, era2, collect_ndv=False)
        spec = table_partition_spec(path)
        if not spec.get("history"):
            raise RuntimeError(
                "fixture must span TWO partition eras — the row exists "
                "to gate era-mixed reads"
            )
        rows = (
            read_time_range(spark, path, _ERA_LO, _ERA_HI)
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "priority string, n_orders long, sum_price double"
    )
