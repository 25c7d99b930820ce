#!/usr/bin/env python
"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed via the noop sink (all columns computed,
nothing shipped to the driver), so timings reflect engine work, not
collect() serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from data_pipeline_project_spark.plans.registry import get_queries  # noqa: E402
from data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    queries = get_queries()

    # Warm the JVM/reader once so timings measure plans, not session init.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # Also warm the higher-order-function / lambda expression machinery
    # (first use pays ~3 s of one-time JVM class loading) on a tiny SF
    # so per-query timings reflect engine work.
    from pyspark.sql import functions as F  # noqa: E402

    from data_pipeline_project_spark.operators.dedup import (  # noqa: E402
        shingle_hashes,
        simhash,
    )
    from data_pipeline_project_spark.sources.tables import load_table  # noqa: E402

    tiny = load_table(spark, "documents", "/root/testdata/sf0.001")
    tiny.select(
        shingle_hashes(F.col("text")).alias("s"), simhash(F.col("text")).alias("f")
    ).where(F.size("s") > 0).count()
    # ...and the Arrow/pandas worker pool (first mapInPandas pays
    # Python-worker startup).
    tiny.limit(8).mapInPandas(lambda it: it, schema=tiny.schema).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
