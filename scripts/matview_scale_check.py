"""Scale check: materialized-view maintenance cost vs recomputation.

Shape chosen to stress the interesting axis — HOT groups: 4M rows in
just 40 groups (100k facts each), then a 10k-row churn commit touching
half the groups. Under that shape:

- full rebuild scans 4M facts;
- recompute-mode refresh scans the touched groups' facts (~2M here —
  group-bounded, not churn-bounded: the worst case for recompute);
- delta-mode refresh does state arithmetic over O(churn) feed rows +
  O(touched) state rows, rescanning only the groups whose min/max a
  delete actually clipped.

Also times the payoff side: reading the view vs running the GROUP BY
over the source.

Run solo: python scripts/matview_scale_check.py [n_rows]
"""

import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import duckdb
    from pyspark.sql import SparkSession, functions as F

    from data_pipeline_project_spark.sinks.layout import write_range_clustered
    from data_pipeline_project_spark.sinks.manifest import (
        merge_upsert,
        write_versioned_manifest,
    )
    from data_pipeline_project_spark.sinks.matview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_groups = 40
    churn = 10_000

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("matview-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    work = tempfile.mkdtemp(prefix="matview_scale_")
    src = os.path.join(work, "src")
    views = {m: os.path.join(work, f"view_{m}") for m in ("recompute", "delta")}

    try:
        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            (F.col("id") % n_groups).alias("g"),
            F.when(F.col("id") % 97 == 0, F.lit(None))
            .otherwise((F.col("id") * 7) % 100_003)
            .cast("long")
            .alias("v"),
        )
        write_range_clustered(df, src, "k", 32)
        write_versioned_manifest(src)

        t0 = time.monotonic()
        create_agg_view(spark, duck, src, views["recompute"], ["g"], "v")
        t_create = time.monotonic() - t0
        create_agg_view(spark, duck, src, views["delta"], ["g"], "v")

        rng = random.Random(8)
        ks = rng.sample(range(0, n + n // 10), churn)  # updates + inserts
        rows = [
            (k, rng.randrange(0, n_groups // 2), rng.randrange(0, 100_003))
            for k in ks
        ]
        merge_upsert(
            spark, duck, src, "k",
            spark.createDataFrame(rows, "k long, g long, v long"),
        )

        walls = {}
        for mode, view in views.items():
            t0 = time.monotonic()
            res = refresh_agg_view(spark, duck, view, mode=mode)
            walls[mode] = time.monotonic() - t0
            print(f"refresh[{mode}]: {walls[mode]:.2f}s  {res}")

        a = sorted(map(tuple, read_agg_view(spark, views["recompute"]).collect()))
        b = sorted(map(tuple, read_agg_view(spark, views["delta"]).collect()))
        assert a == b, "modes diverged"

        t0 = time.monotonic()
        read_agg_view(spark, views["delta"]).collect()
        t_view = time.monotonic() - t0
        t0 = time.monotonic()
        spark.read.parquet(src).groupBy("g").agg(
            F.count("v"), F.sum("v"), F.min("v"), F.max("v"), F.avg("v")
        ).collect()
        t_direct = time.monotonic() - t0

        print(
            f"\nrows={n} groups={n_groups} churn={churn}\n"
            f"full build        : {t_create:.2f}s\n"
            f"refresh recompute : {walls['recompute']:.2f}s\n"
            f"refresh delta     : {walls['delta']:.2f}s\n"
            f"read view         : {t_view:.2f}s\n"
            f"direct GROUP BY   : {t_direct:.2f}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
