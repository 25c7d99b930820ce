"""Streaming lakehouse ingest (streaming/lakehouse_ingest.py):
micro-batches commit as intent-stamped optimistic appends, exactly
once across replays and restarts, coexisting with concurrent writers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks.manifest import (
    read_manifest,
    read_version,
    snapshot_versions,
    write_versioned_manifest,
)
from data_pipeline_project_spark.streaming.lakehouse_ingest import (
    lakehouse_append_batch_fn,
    start_lakehouse_append_stream,
)

SCHEMA = "k long, v long"


def _write_source_file(spark, src_dir, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(src_dir)


def test_stream_appends_exactly_once_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_source_file(spark, src, 0, 100)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_lakehouse_append_stream(spark, stream, table, ckpt)
    q.awaitTermination(120)
    assert read_version(spark, table).count() == 100
    v1 = snapshot_versions(table)[-1]

    # new source data; restart on the SAME checkpoint: only the new
    # file is consumed, committed as an optimistic append with a txn
    # intent and a stream_append stamp
    _write_source_file(spark, src, 100, 150)
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_lakehouse_append_stream(spark, stream2, table, ckpt)
    q2.awaitTermination(120)
    live = read_version(spark, table)
    assert live.count() == 150
    assert live.select("k").distinct().count() == 150  # no double-append

    head = read_manifest(os.path.join(table, "_manifests", "latest.json"))
    assert head["txn"]["op"] == "append" and head["txn"]["inserts_only"]
    assert head["app"]["stream_append"]["batch_id"] >= 1
    assert snapshot_versions(table)[-1] > v1

    # a third restart with NO new data: no commit at all
    v_before = snapshot_versions(table)[-1]
    stream3 = spark.readStream.schema(SCHEMA).parquet(src)
    q3 = start_lakehouse_append_stream(spark, stream3, table, ckpt)
    q3.awaitTermination(120)
    assert snapshot_versions(table)[-1] == v_before


def test_batch_replay_is_a_noop(spark, tmp_path):
    """foreachBatch may replay a batch after a checkpoint rollback:
    the committed batch_id high-water mark makes the replay a no-op —
    including on a COLD sink that must recover the mark from the
    manifest history."""
    table = str(tmp_path / "table")
    spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.parquet(table)
    write_versioned_manifest(table)

    fn = lakehouse_append_batch_fn(spark, table, "sinkA")
    b0 = spark.range(100, 120).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    fn(b0, 0)
    fn(b0, 1)  # a different batch id appends again
    assert read_version(spark, table).count() == 90
    assert [r["replayed"] for r in fn.results] == [False, False]

    # replay of batch 1 on the SAME sink: no-op
    fn(b0, 1)
    assert fn.results[-1]["replayed"] is True
    assert read_version(spark, table).count() == 90

    # cold sink (fresh closure, e.g. after a driver crash): recovers
    # the high-water mark from the manifests and still skips
    fn_cold = lakehouse_append_batch_fn(spark, table, "sinkA")
    fn_cold(b0, 1)
    assert fn_cold.results[-1]["replayed"] is True
    assert read_version(spark, table).count() == 90

    # a DIFFERENT sink id is a different logical stream: it appends
    fn_b = lakehouse_append_batch_fn(spark, table, "sinkB")
    fn_b(
        spark.range(200, 210).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        0,
    )
    assert read_version(spark, table).count() == 100
    # and sinkA's high-water mark survives sinkB's interleaved commit
    fn_a2 = lakehouse_append_batch_fn(spark, table, "sinkA")
    fn_a2(b0, 1)
    assert fn_a2.results[-1]["replayed"] is True


def test_ingest_coexists_with_concurrent_merge(spark, duck, tmp_path):
    """An ingest batch racing a targeted merge: both commit (the
    append's inserts_only intent commutes), nothing lost."""
    from data_pipeline_project_spark.sinks import manifest as M
    from data_pipeline_project_spark.sinks.layout import (
        write_range_clustered,
    )
    from data_pipeline_project_spark.sinks.manifest import merge_upsert

    table = str(tmp_path / "table")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_range_clustered(df, table, "k", 3)
    write_versioned_manifest(table)

    fn = lakehouse_append_batch_fn(spark, table, "sinkC")

    class _InterposeOnce:
        def __init__(self, run):
            self.run, self.fired, self.inside = run, False, False

        def __call__(self, version, mdir):
            if self.fired or self.inside:
                return
            self.fired = self.inside = True
            try:
                self.run()
            finally:
                self.inside = False

    def run_merge():
        merge_upsert(
            spark, duck, table, "k",
            spark.createDataFrame([(5, -1)], SCHEMA),
        )

    M._test_claim_interposer = _InterposeOnce(run_merge)
    try:
        fn(
            spark.range(9000, 9010).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v")
            ),
            0,
        )
    finally:
        M._test_claim_interposer = None
    live = read_version(spark, table)
    assert live.count() == 510
    assert {r.v for r in live.where("k = 5").collect()} == {-1}
    assert live.where("k >= 9000").count() == 10
