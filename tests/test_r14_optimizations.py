"""Regression pins for the r14 optimization round's operator-internal
changes: the ANALYZE schema-grouping fix (one sketch job per schema
group, not per file) and the advised-join fixture's parquet reuse
(results identical across invocations, parquet written once per
process)."""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def test_analyze_runs_one_sketch_job_per_schema_group(spark, tmp_path):
    """str(ParquetSchema) embeds the object's memory address, which made
    every file its own 'schema group' — ANALYZE ran one scan job per
    FILE (r14 fix: key on the arrow schema string). Pin: a 4-file
    same-schema table analyzes with exactly ONE collect."""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from data_pipeline_project_spark.sinks.manifest import (
        analyze_table,
        write_versioned_manifest,
    )

    path = str(tmp_path / "t")
    spark.range(0, 4000).select(
        (F.col("id") % 97).alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(4).write.parquet(path)
    write_versioned_manifest(path)

    calls = []
    orig = CDF.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    CDF.collect = counting
    try:
        res = analyze_table(path, spark=spark)
    finally:
        CDF.collect = orig
    assert res["files_analyzed"] == 4
    assert len(calls) == 1, (
        f"expected ONE sketch job for 4 same-schema files, saw {len(calls)}"
    )


def test_advised_join_parity_rows_stable_and_fixture_written_once(spark):
    from data_pipeline_project_spark.plans import catalog_queries as C

    a = sorted(map(tuple, C.advised_join_parity(spark, SF).collect()))
    src = C._ADVISED_FIXTURE_SRC.get(SF)
    assert src and os.path.isdir(os.path.join(src, "fact"))
    mtimes = {
        f: os.path.getmtime(os.path.join(src, "fact", f))
        for f in os.listdir(os.path.join(src, "fact"))
    }
    b = sorted(map(tuple, C.advised_join_parity(spark, SF).collect()))
    assert a == b
    # second invocation reused the written parquet (no rewrite)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(src, "fact", f))
        for f in os.listdir(os.path.join(src, "fact"))
    }
