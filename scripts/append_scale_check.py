"""Scale check for the r10 commit-path work: append commit cost and
per-partition compaction.

A. Append commit cost — the claim: append_snapshot's commit reads
   O(added) parquet footers, while the listing-based
   write_versioned_manifest re-reads EVERY footer. On a table
   fragmented into ~1,500 files the footer-read counts and walls are
   measured directly (read_metadata is monkeypatch-counted), appending
   one identical file through each path on twin tables.

B. Per-partition compaction — the claim: cost tracks the FRAGMENTED
   partitions, not the table. A 64-partition table with k fragmented
   partitions (6 small files each) is compacted for k in {4, 16}; the
   wall should scale with k while untouched partitions stay
   byte-identical (asserted).

Run solo: python scripts/append_scale_check.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession, functions as F

    from data_pipeline_project_spark.sinks.manifest import (
        append_snapshot,
        compact_snapshot,
        read_version,
        write_versioned_manifest,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("append-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="append_scale_")

    # --- A. append commit cost on a fragmented table -------------------
    n_files = 1500
    print(f"[append] building {n_files}-file table twins...")

    def fragmented(name):
        path = os.path.join(work, name)
        df = spark.range(0, n_files * 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        df.repartition(n_files).write.parquet(path)
        write_versioned_manifest(path)
        return path

    t_opt = fragmented("opt")
    t_list = fragmented("list")
    # JVM-side batch (spark.range, not createDataFrame-over-pickles):
    # a python-sourced local relation pays ~2.5s of Python-worker
    # startup PER JOB, which would swamp the commit-path signal
    batch = spark.range(0, 100).select(
        (F.col("id") + 10_000_000).alias("k"),
        F.lit(-1).cast("long").alias("v"),
    ).coalesce(1)

    seen = []
    real = pq.read_metadata

    def counting(f, *a, **kw):
        seen.append(str(f))
        return real(f, *a, **kw)

    pq.read_metadata = counting
    try:
        seen.clear()
        t0 = time.monotonic()
        append_snapshot(spark, t_opt, batch, key_col="k")
        w_opt = time.monotonic() - t0
        reads_opt = len(seen)

        seen.clear()
        t0 = time.monotonic()
        batch.write.mode("append").parquet(t_list)
        write_versioned_manifest(t_list)
        w_list = time.monotonic() - t0
        reads_list = len(seen)
    finally:
        pq.read_metadata = real
    print(f"  optimistic append : {w_opt:.2f}s, {reads_opt} footer reads")
    print(f"  listing-based     : {w_list:.2f}s, {reads_list} footer reads")
    print(f"  footer-read ratio : {reads_list / max(1, reads_opt):.0f}x")
    assert read_version(spark, t_opt).count() == read_version(
        spark, t_list
    ).count()
    shutil.rmtree(t_opt, ignore_errors=True)
    shutil.rmtree(t_list, ignore_errors=True)

    # --- B. per-partition compaction tracks fragmentation --------------
    n_parts = 64
    for k_frag in (4, 16):
        path = os.path.join(work, f"p{k_frag}")
        df = spark.range(0, 640_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
            (F.col("id") % n_parts).cast("int").alias("pt"),
        )
        df.repartition(1).write.partitionBy("pt").parquet(path)
        write_versioned_manifest(path)
        # fragment k_frag partitions with 5 extra small files each
        for p in range(k_frag):
            for j in range(5):
                spark.createDataFrame(
                    [(1_000_000 + p * 10 + j, -1, p)],
                    "k long, v long, pt int",
                ).coalesce(1).write.mode("append").parquet(
                    os.path.join(path, f"pt={p}")
                )
        write_versioned_manifest(path)
        import hashlib

        def dir_hash(p):
            d = os.path.join(path, f"pt={p}")
            return {
                f: hashlib.md5(
                    open(os.path.join(d, f), "rb").read()
                ).hexdigest()
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }

        untouched_before = dir_hash(n_parts - 1)
        t0 = time.monotonic()
        res = compact_snapshot(spark, path, small_bytes=1 << 14)
        wall = time.monotonic() - t0
        assert res["partitions_compacted"] == k_frag, res
        assert dir_hash(n_parts - 1) == untouched_before
        print(
            f"[compact] {k_frag}/{n_parts} fragmented partitions: "
            f"{wall:.2f}s ({res['files_compacted']} files -> "
            f"{res['partitions_compacted']} merged)"
        )
        shutil.rmtree(path, ignore_errors=True)

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
