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
