"""Custom Python DataSource (sources/sensor_sim.py): the connector
extension point — batch partition planning, deterministic reads,
streaming offsets with exactly-once batch planning."""

from pyspark.sql import functions as F


def _register(spark):
    from data_pipeline_project_spark.sources.sensor_sim import (
        SensorSimDataSource,
    )

    spark.dataSource.register(SensorSimDataSource)


def test_batch_read_deterministic_and_partitioning_invariant(spark):
    _register(spark)
    a = (
        spark.read.format("sensorsim")
        .option("n_rows", 500).option("n_partitions", 8)
        .load()
    )
    b = (
        spark.read.format("sensorsim")
        .option("n_rows", 500).option("n_partitions", 3)
        .load()
    )
    assert a.count() == 500
    assert a.schema.simpleString() == (
        "struct<sensor_id:int,ts:timestamp,temperature:double,"
        "humidity:double,pressure:double>"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # value contract: bounded ranges, sensors cycle
    stats = a.agg(
        F.min("temperature"), F.max("temperature"),
        F.min("humidity"), F.max("humidity"),
        F.countDistinct("sensor_id"),
    ).first()
    assert -20.0 <= stats[0] and stats[1] < 50.0
    assert 0.0 <= stats[2] and stats[3] < 100.0
    assert stats[4] == 50


def test_batch_source_composes_with_validation_contract(spark):
    """The simulator speaks the sensor contract, so engine operators
    compose directly on it — per-sensor long-format stats run
    unchanged."""
    _register(spark)
    df = (
        spark.read.format("sensorsim")
        .option("n_rows", 1000).option("n_sensors", 10)
        .load()
    )
    from data_pipeline_project_spark.operators.aggregates import (
        long_format_stats,
    )

    out = long_format_stats(
        df, group_cols=["sensor_id"],
        metric_cols=["temperature", "humidity", "pressure"],
        time_col="ts",
    )
    rows = out.collect()
    assert len(rows) == 10 * 3  # every sensor x metric, none elided
    assert all(r.record_count == 100 for r in rows)


def test_stream_reader_drains_exactly_once(spark, tmp_path):
    _register(spark)
    out_dir = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("sensorsim").option("n_rows", 350).load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out_dir)
    # finite stream fully drained, no duplicates across micro-batches,
    # and identical rows to the batch reader over the same index space
    assert got.count() == 350
    batch = spark.read.format("sensorsim").option("n_rows", 350).load()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    # restart on the same checkpoint: the committed offset replays
    # nothing - exactly-once across restarts
    run()
    assert spark.read.parquet(out_dir).count() == 350


def test_jsonl_audit_writer_two_phase_commit(spark, tmp_path):
    """Custom sink: staged files promote only on driver commit, and
    _SUCCESS records the exact committed file set and row total."""
    import json
    import os

    from data_pipeline_project_spark.sources.sensor_sim import (
        JsonlAuditDataSource,
    )

    spark.dataSource.register(JsonlAuditDataSource)
    out = str(tmp_path / "audit")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(4)
    df.write.format("jsonlaudit").option("path", out).mode("append").save()

    success = json.load(open(os.path.join(out, "_SUCCESS")))
    assert success["total_rows"] == 100
    assert len(success["files"]) == 4
    # staged area fully promoted
    assert os.listdir(os.path.join(out, "_staging")) == []
    # data round-trips
    rows = []
    for f in success["files"]:
        with open(os.path.join(out, f["file"])) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted((r["k"], r["v"]) for r in rows) == [(i, i % 7) for i in range(100)]
