"""Scale gate for advised_join's consumed skew advice (r12).

The r11 verdict asked for a fixture where the ADVICE FLIPS the
physical plan and the flipped plan measures faster at scale. Fixture:
a fact table where ONE key holds 40% of the rows joined to a dim too
big to broadcast — the log's heavy-hitter sketch flags the skew, and
advised_join salts the shuffle (key, _salt) so the hot key spreads
over salt_buckets reducers instead of landing on one.

Measured at 1x and 10x rows, AQE disabled for the comparison (AQE's
own skew-join would otherwise mask the effect being isolated; at a
real deployment BOTH are on and compose). Pass = salted beats
unsalted at 10x and results are checksum-equal.

Usage: python scripts/advised_join_scale_check.py
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

from data_pipeline_project_spark.sinks.layout import (  # noqa: E402
    advised_join,
    join_plan_advice,
    write_range_clustered,
)
from data_pipeline_project_spark.sinks.manifest import (  # noqa: E402
    analyze_table,
    read_version,
    write_versioned_manifest,
)


def _mk(spark, path, df, files):
    write_range_clustered(df, path, "k", files)
    write_versioned_manifest(path)
    analyze_table(path)


def _checksum(df):
    return tuple(
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)"))
            .alias("h"),
        ).collect()[0]
    )


def measure(spark, rows, work, tag):
    fact = os.path.join(work, f"fact_{tag}")
    dim = os.path.join(work, f"dim_{tag}")
    _mk(
        spark, fact,
        spark.range(0, rows).select(
            F.when(F.col("id") % 5 < 2, F.lit(42))
            .otherwise(F.col("id") % 200_000)
            .alias("k"),
            (F.col("id") % 31).alias("x"),
        ), files=16,
    )
    _mk(
        spark, dim,
        spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("d")
        ), files=4,
    )
    adv = join_plan_advice(fact, dim, "k", broadcast_bytes=1)
    assert adv["strategy"] == "shuffle" and adv.get("skew_side") == "a", adv

    # unsalted merge join (what a planner without the sketch runs)
    a, b = read_version(spark, fact), read_version(spark, dim)
    t0 = time.monotonic()
    plain = _checksum(a.hint("merge").join(b, "k"))
    t_plain = time.monotonic() - t0

    df, _ = advised_join(
        spark, fact, dim, "k", broadcast_bytes=1, salt_buckets=32
    )
    t0 = time.monotonic()
    salted = _checksum(df)
    t_salted = time.monotonic() - t0
    assert plain == salted, (plain, salted)
    for p in (fact, dim):
        shutil.rmtree(p, ignore_errors=True)
    return t_plain, t_salted


def main():
    os.system("uptime")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("advised-join-scale")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="advised_join_scale_")
    measure(spark, 200_000, work, "warm")
    p1, s1 = measure(spark, 2_000_000, work, "x1")
    p10, s10 = measure(spark, 20_000_000, work, "x10")
    print(f"\n1x : unsalted {p1:.2f}s vs salted {s1:.2f}s")
    print(f"10x: unsalted {p10:.2f}s vs salted {s10:.2f}s "
          f"(speedup {p10 / max(s10, 1e-9):.2f}x)")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    ok = s10 < p10
    print("RESULT:", "ok" if ok else "NO WIN AT 10x")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
