"""Scale gate for the r12 distributed ANALYZE / executor-side NDV.

The r11 weak mark: _entry_ndv / analyze_table read data files ON THE
DRIVER via DuckDB — O(added) per commit and O(table bytes) through
one process per ANALYZE. r12 moved both onto executors (one Spark
job; the driver merges bounded register/top-K summaries). This script
measures the claim at two scales (1x and 10x rows, same file count
ratio):

- ANALYZE wall should grow ~linearly with data per fixed core count
  (the work is the distributed scan) — NOT superlinearly, and
- DRIVER CPU (ru_utime+ru_stime of this process, which excludes the
  executor pool's JVM threads only partially on local mode — so the
  honest signal reported is driver-process CPU per GB, which must
  FALL as data grows if the merge really is bounded)
- plus the per-commit inline-sketch envelope at both scales.

Local caveat (recorded with the numbers): local[*] executors live in
one JVM whose threads this process's rusage cannot fully separate;
the load-independent signal is the BOUNDED collect row count, also
printed (files x cols x 128 max).

Usage: python scripts/analyze_scale_check.py
"""

import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from data_pipeline_project_spark.sinks import manifest as M  # noqa: E402
from data_pipeline_project_spark.sinks.layout import (  # noqa: E402
    write_range_clustered,
)
from data_pipeline_project_spark.sinks.manifest import (  # noqa: E402
    analyze_table,
    append_snapshot,
    table_column_ndv,
    write_versioned_manifest,
)


def measure(spark, rows: int, files: int, work: str, tag: str) -> dict:
    path = os.path.join(work, tag)
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 9973).alias("v"),
        F.format_string("cat-%d", F.col("id") % 211).alias("s"),
        (F.col("id") % 1_000_003).cast("double").alias("x"),
    )
    write_range_clustered(df, path, "k", files)
    write_versioned_manifest(path)  # metadata-only bootstrap

    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.monotonic()
    res = analyze_table(path)
    wall = time.monotonic() - t0
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    driver_cpu = (ru1.ru_utime - ru0.ru_utime) + (
        ru1.ru_stime - ru0.ru_stime
    )
    assert res["files_analyzed"] == files, res
    ndv = table_column_ndv(path, "v")
    assert ndv["coverage"] == 1.0
    assert abs(ndv["ndv"] - 9973) / 9973 < 0.28, ndv

    # per-commit inline sketch envelope at this scale
    t0 = time.monotonic()
    append_snapshot(
        spark, path,
        spark.range(rows, rows + rows // 100 + 10).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("v"),
            F.lit("cat-new").alias("s"),
            F.col("id").cast("double").alias("x"),
        ).coalesce(1),
        key_col="k",
    )
    commit_wall = time.monotonic() - t0

    bytes_total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    out = {
        "rows": rows,
        "files": files,
        "gb": bytes_total / 1e9,
        "analyze_wall_s": round(wall, 2),
        "driver_cpu_s": round(driver_cpu, 2),
        "bounded_collect_rows_max": files * 4 * 128,
        "commit_with_sketch_s": round(commit_wall, 2),
    }
    shutil.rmtree(path, ignore_errors=True)
    return out


def main():
    os.system("uptime")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("analyze-scale")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="analyze_scale_")
    # warm the session (JVM/codegen)
    measure(spark, 100_000, 2, work, "warm")
    small = measure(spark, 1_000_000, 8, work, "x1")
    big = measure(spark, 10_000_000, 80, work, "x10")
    print("\n1x :", small)
    print("10x:", big)
    ratio = big["analyze_wall_s"] / max(small["analyze_wall_s"], 1e-9)
    cpu_per_gb_small = small["driver_cpu_s"] / max(small["gb"], 1e-9)
    cpu_per_gb_big = big["driver_cpu_s"] / max(big["gb"], 1e-9)
    print(
        f"\nANALYZE wall 10x/1x = {ratio:.1f} (<= ~13 on fixed cores "
        f"is linear-with-data; r11's driver loop was also serial so "
        f"the DISTRIBUTION win shows in driver CPU per GB)"
    )
    print(
        f"driver-process CPU per GB: 1x {cpu_per_gb_small:.2f} s/GB, "
        f"10x {cpu_per_gb_big:.2f} s/GB "
        f"(must not GROW with scale; bounded-merge contract)"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    ok = ratio <= 14 and cpu_per_gb_big <= cpu_per_gb_small * 1.5
    print("RESULT:", "ok" if ok else "REGRESSION")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
