"""Task-retry determinism probe (run as a subprocess: needs its own
SparkSession with ``local[8,4]`` — the test session's ``local[8]``
master has maxFailures=1, where any task failure kills the job).

On a 1000-executor cluster task retries are routine (preemption, OOM
kills, flaky disks); Spark's correctness contract is that a retried
task recomputes its partition from deterministic lineage and the job's
RESULT is unchanged. This probe verifies the repo's operators actually
live inside that contract: a mapInPandas stage deterministically
throws on the first attempt of one partition (so the scheduler must
retry it), and the downstream aggregation must produce byte-identical
results with and without the injected failure. An accumulator counts
RETRIED attempts to prove the failure really fired (attemptNumber > 0
can only exist after a failure) — a silently-skipped injection would
make the equality vacuous.

Prints one JSON line: {"match": bool, "retries": int, ...}.
"""

from __future__ import annotations

import json
import sys

from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8,4]")
        .appName("fault-injection-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        li = spark.read.parquet(f"{sf}/lineitem.parquet").repartition(8)
        acc = spark.sparkContext.accumulator(0)

        def inject(iterator):
            tc = TaskContext.get()
            if tc is not None and tc.partitionId() == 3 and tc.attemptNumber() == 0:
                raise RuntimeError("injected task failure: partition 3, attempt 0")
            if tc is not None and tc.attemptNumber() > 0:
                # Counting the RETRY, not the failure: accumulator
                # updates from failed tasks are discarded by design
                # (Spark's exactly-once accumulator contract for
                # result-affecting updates), so a count inside the
                # failing attempt would always read 0.
                acc.add(1)
            yield from iterator

        faulty_src = li.mapInPandas(inject, li.schema)

        def aggregate(df):
            return (
                df.groupBy("l_returnflag")
                .agg(
                    F.sum(F.col("l_orderkey") % 997).cast("long").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                    F.min(F.col("l_partkey") % 251).cast("long").alias("m"),
                )
                .orderBy("l_returnflag")
            )

        clean = [tuple(r) for r in aggregate(li).collect()]
        faulty = [tuple(r) for r in aggregate(faulty_src).collect()]
        out = {
            "match": clean == faulty,
            "retries": acc.value,
            "clean": clean,
            "faulty": faulty,
        }
        print(json.dumps(out))
        return 0 if out["match"] and out["retries"] >= 1 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
