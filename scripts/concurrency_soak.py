"""Soak the optimistic-concurrency tier beyond its CI seeds.

Each seed: a fresh range-clustered table, a random PAIR of writers
drawn from the full optimistic op set — merge_upsert, delete_rows_dv,
delete_rows_targeted(commit=True), compact_snapshot — on DISJOINT key
windows, interleaved deterministically through the claim seam (writer
A runs entirely inside writer B's commit window, so B always loses the
CAS and exercises the rebase). The final head is compared against a
sequential reference (same ops, one after the other, on a twin table):
equality proves the rebase commutes. Every intermediate version is
also replayed (time travel over interleaved commits).

Compaction pairs only with non-compaction ops (two compactions share
removed files — a designed conflict, covered by CI's conflict tests).

Usage: python scripts/concurrency_soak.py [n_seeds]
"""

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _InterposeOnce:
    def __init__(self, run_a):
        self.run_a = run_a
        self.fired = False
        self.inside = False

    def __call__(self, version, mdir):
        if self.fired or self.inside:
            return
        self.fired = True
        self.inside = True
        try:
            self.run_a()
        finally:
            self.inside = False


def main():
    import duckdb
    from pyspark.sql import SparkSession, functions as F

    from data_pipeline_project_spark.sinks import manifest as M
    from data_pipeline_project_spark.sinks.layout import write_range_clustered
    from data_pipeline_project_spark.sinks.manifest import (
        compact_snapshot,
        delete_rows_dv,
        delete_rows_targeted,
        merge_upsert,
        read_version,
        snapshot_versions,
        write_versioned_manifest,
    )

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("concurrency-soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    work = tempfile.mkdtemp(prefix="conc_soak_")

    N, FILES = 800, 4

    def fresh(name, small_tail):
        """Range-clustered table; with small_tail, two tiny appended
        files so compaction has bait that no merge window touches."""
        path = os.path.join(work, name)
        df = spark.range(0, N).select(
            F.col("id").alias("k"), ((F.col("id") * 7) % 101).alias("v")
        )
        write_range_clustered(df, path, "k", FILES)
        if small_tail:
            for extra_k in (10_000, 10_001):
                spark.createDataFrame(
                    [(extra_k, -100)], "k long, v long"
                ).coalesce(1).write.mode("append").parquet(path)
        write_versioned_manifest(path)
        return path

    def draw_op(rng, window, allow_compact):
        kinds = ["merge", "dv", "delete"] + (["compact"] if allow_compact else [])
        kind = rng.choice(kinds)
        keys = rng.sample(window, rng.randrange(1, 5))
        if kind == "merge":
            rows = [(int(k), -rng.randrange(1, 50)) for k in keys]
            return kind, rows
        if kind == "compact":
            return kind, None
        return kind, [(int(k),) for k in keys]

    def run_op(path, kind, payload):
        if kind == "merge":
            merge_upsert(
                spark, duck, path, "k",
                spark.createDataFrame(payload, "k long, v long"),
            )
        elif kind == "dv":
            delete_rows_dv(
                spark, duck, path, "k",
                spark.createDataFrame(payload, "k long"),
            )
        elif kind == "delete":
            delete_rows_targeted(
                spark, duck, path, "k",
                spark.createDataFrame(payload, "k long"), commit=True,
            )
        else:
            # threshold between the tiny appended singletons and the
            # clustered quarter-table files
            sizes = sorted(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            compact_snapshot(spark, path, small_bytes=sizes[2] - 1)

    failures = 0
    for seed in range(300, 300 + n_seeds):
        rng = random.Random(seed)
        lo_window = list(range(0, N // 4))           # file 1's range
        hi_window = list(range(3 * N // 4, N))       # file 4's range

        kind_a, pay_a = draw_op(rng, lo_window, allow_compact=True)
        kind_b, pay_b = draw_op(rng, hi_window, allow_compact=kind_a != "compact")
        if kind_b == "compact" and kind_a == "compact":
            kind_b = "merge"
        small_tail = "compact" in (kind_a, kind_b)

        path = fresh(f"t{seed}", small_tail)
        ref = fresh(f"r{seed}", small_tail)

        M._test_claim_interposer = _InterposeOnce(
            lambda: run_op(path, kind_a, pay_a)
        )
        try:
            run_op(path, kind_b, pay_b)
        finally:
            M._test_claim_interposer = None

        run_op(ref, kind_a, pay_a)
        run_op(ref, kind_b, pay_b)

        live = sorted(map(tuple, read_version(spark, path).collect()))
        want = sorted(map(tuple, read_version(spark, ref).collect()))
        ok = live == want
        # time travel: every interleaved version must still read
        replayable = True
        for v in snapshot_versions(path):
            try:
                read_version(spark, path, v).count()
            except Exception as e:  # noqa: BLE001
                replayable = False
                print(f"  seed {seed}: version {v} unreadable: {e}")
        status = "ok" if ok and replayable else "DIVERGED"
        if status != "ok":
            failures += 1
        print(f"seed {seed}: {kind_a}+{kind_b} -> {status}")
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)

    print(f"\nsoak complete: {n_seeds} seeds, {failures} divergence(s)")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
