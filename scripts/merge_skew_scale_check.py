"""Scale gate for the bulk merge's consumed skew advice (r13).

Fixture: a skewed-CDC shape — a target table where ONE key holds 40%
of the rows, merged with a batch of fresh keys (the usual CDC insert
wave). merge_bulk's whole-table anti-join shuffles the target by key,
so the hot key serializes one reducer; with the log's heavy-hitter
sketch flagging >= 20% mass, _merge_skew_salts salts the exchange
(key, _salt) exactly as advised_join does for user joins.

Measured: the merge FRAME (the exchange being salted) at 1x and 10x
rows with AQE disabled (its own skew splitting would mask the effect;
in production both compose), salted vs forced-unsalted, checksum-
equal. Plus one REAL merge_bulk pair at 1x asserting byte-equal final
table state. Pass = salted beats unsalted at 10x and all results
match.

Usage: python scripts/merge_skew_scale_check.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import data_pipeline_project_spark.sinks.manifest as M  # noqa: E402
from data_pipeline_project_spark.sinks.manifest import (  # noqa: E402
    _merge_skew_salts,
    analyze_table,
    bulk_merge_frame,
    merge_bulk,
    read_version,
    write_versioned_manifest,
)


def _mk_target(spark, path, rows):
    # 60% of rows on ONE key — a genuinely hot entity (the shape AQE's
    # own splitting also exists for; isolated here with AQE off)
    spark.range(0, rows).select(
        F.when(F.col("id") % 5 < 3, F.lit(42))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") % 31).alias("v"),
    ).repartition(16).write.parquet(path)
    write_versioned_manifest(path)
    analyze_table(path)


def _checksum(df):
    return tuple(
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("k", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
    )


def measure(spark, rows, work, tag):
    path = os.path.join(work, f"t_{tag}")
    _mk_target(spark, path, rows)
    nsalt = _merge_skew_salts(path, "k")
    assert nsalt >= 2, f"advice must fire on the skewed fixture ({nsalt})"
    # a CDC batch is roughly constant-sized regardless of table scale;
    # what scales (and what the salt fixes) is the TARGET side of the
    # anti-join exchange — the hot key's row count grows 10x
    updates = spark.range(0, 100_000).select(
        (F.col("id") + 10 * rows).alias("k"), F.lit(-1).alias("v")
    )
    target = read_version(spark, path)

    t0 = time.monotonic()
    plain = _checksum(bulk_merge_frame(target, updates, "k", ["k", "v"]))
    t_plain = time.monotonic() - t0

    t0 = time.monotonic()
    salted = _checksum(
        bulk_merge_frame(target, updates, "k", ["k", "v"], salt_buckets=32)
    )
    t_salted = time.monotonic() - t0
    assert plain == salted, (plain, salted)
    shutil.rmtree(path, ignore_errors=True)
    return t_plain, t_salted


def state_equality(spark, work):
    """One real merge pair: advice-on vs forced-unsalted, byte-equal."""
    a, b = os.path.join(work, "sa"), os.path.join(work, "sb")
    _mk_target(spark, a, 200_000)
    _mk_target(spark, b, 200_000)
    upd = spark.range(0, 5_000).select(
        (F.col("id") + 5_000_000).alias("k"), F.lit(-1).alias("v")
    )
    merge_bulk(spark, a, "k", upd)  # advice fires (salted)
    orig = M._merge_skew_salts
    M._merge_skew_salts = lambda *a_, **k_: 0
    try:
        merge_bulk(spark, b, "k", upd)
    finally:
        M._merge_skew_salts = orig
    ca = _checksum(read_version(spark, a))
    cb = _checksum(read_version(spark, b))
    assert ca == cb, (ca, cb)
    print("state equality: ok", ca)


def main():
    os.system("uptime")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("merge-skew-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="merge_skew_scale_")
    state_equality(spark, work)
    measure(spark, 200_000, work, "warm")
    p1, s1 = measure(spark, 2_000_000, work, "x1")
    p10, s10 = measure(spark, 20_000_000, work, "x10")
    print(f"\n1x : unsalted {p1:.2f}s vs salted {s1:.2f}s")
    print(
        f"10x: unsalted {p10:.2f}s vs salted {s10:.2f}s "
        f"(speedup {p10 / max(s10, 1e-9):.2f}x)"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    ok = s10 < p10
    print("RESULT:", "ok" if ok else "NO WIN AT 10x")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
