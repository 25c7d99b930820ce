"""with_row_position statistics paths: footer stats, dense fast path,
and supplied-stats parity with the self-computed statistics job."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_project_spark.functions.positions import (
    parquet_key_stats,
    with_row_position,
)


def _expected(df, key):
    return sorted(
        (r[key], r.pos)
        for r in df.withColumn("pos", F.row_number().over(Window.orderBy(key))).collect()
    )


def test_parquet_key_stats_exact(spark):
    stats = parquet_key_stats("/root/testdata/sf0.001/events.parquet", "event_id")
    assert stats is not None
    lo, hi, n, nulls = stats
    row = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .agg(
            F.min("event_id"), F.max("event_id"), F.count(F.lit(1)),
            F.count(F.lit(1)) - F.count("event_id"),
        )
        .first()
    )
    assert (lo, hi, n, nulls) == tuple(row)


def test_parquet_key_stats_missing_column():
    assert parquet_key_stats("/root/testdata/sf0.001/events.parquet", "nope") is None
    assert parquet_key_stats("/no/such/path.parquet", "event_id") is None


def test_dense_fast_path_no_shuffle_and_exact(spark):
    df = spark.range(10, 510).select(F.col("id").alias("k"))
    out = with_row_position(df, "k", col_name="pos", key_stats=(10, 509, 500, 0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert sorted((r.k, r.pos) for r in out.collect()) == _expected(df, "k")


def test_non_dense_stats_use_bucketed_path(spark):
    # Gaps -> 4-tuple stats do NOT prove density -> bucketed path, exact.
    df = spark.range(0, 300).select((F.col("id") * 3).alias("k"))
    out = with_row_position(
        df, "k", col_name="pos", persist=False, key_stats=(0, 897, 300, 0)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_rp_bucket" in plan, plan
    assert sorted((r.k, r.pos) for r in out.collect()) == _expected(df, "k")


def test_three_tuple_stats_match_self_computed(spark):
    df = spark.range(0, 200).select((F.col("id") * 2 + 5).alias("k"))
    with_stats = with_row_position(
        df, "k", col_name="pos", persist=False, key_stats=(5, 403, 200)
    )
    self_computed = with_row_position(df, "k", col_name="pos", persist=False)
    assert sorted((r.k, r.pos) for r in with_stats.collect()) == sorted(
        (r.k, r.pos) for r in self_computed.collect()
    )


def test_null_keys_sort_first(spark):
    rows = [(None,), (7,), (3,), (None,), (12,)]
    df = spark.createDataFrame(rows, "k int")
    out = with_row_position(df, "k", F.lit(1), col_name="pos", persist=False)
    got = {r.pos for r in out.where(F.col("k").isNull()).collect()}
    assert got == {1, 2}  # nulls occupy the first positions
    non_null = sorted((r.k, r.pos) for r in out.where(F.col("k").isNotNull()).collect())
    assert non_null == [(3, 3), (7, 4), (12, 5)]
