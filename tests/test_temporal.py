"""Unit tests for operators/temporal.py — as-of and interval range
joins (edge semantics + plan shape; full-oracle parity runs in
test_queries_vs_duckdb.py via the registered queries)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_project_spark.operators.temporal import (
    asof_join,
    interval_range_join,
)


def _ts(s: str):
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("lid", T.LongType()),
        T.StructField("lts", T.TimestampType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("rts", T.TimestampType()),
        T.StructField("rv", T.DoubleType()),
    ]
)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # matches rv=1.0 (exact tie)
            (1, 101, _ts("2024-01-01 12:30:00")),  # matches rv=2.0
            (1, 102, _ts("2024-01-01 09:00:00")),  # before all rights -> null
            (2, 200, _ts("2024-01-01 12:00:00")),  # other key
            (3, 300, _ts("2024-01-01 12:00:00")),  # key absent on right
            (None, 400, _ts("2024-01-01 12:00:00")),  # null key passes through
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 12:00:00"), 2.0),
            (1, _ts("2024-01-01 13:00:00"), 3.0),
            (2, _ts("2024-01-01 11:00:00"), 9.0),
            (None, _ts("2024-01-01 00:00:00"), -1.0),  # null key never matches
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def test_asof_backward(spark, frames):
    left, right = frames
    out = {
        r.lid: (r.right_rts, r.right_rv)
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    assert out[100] == (_ts("2024-01-01 10:00:00").replace(tzinfo=None), 1.0)  # tie matches
    assert out[101] == (_ts("2024-01-01 12:00:00").replace(tzinfo=None), 2.0)
    assert out[102] == (None, None)  # nothing at-or-before
    assert out[200] == (_ts("2024-01-01 11:00:00").replace(tzinfo=None), 9.0)
    assert out[300] == (None, None)  # key absent on right
    assert out[400] == (None, None)  # null left key never matches null right key
    assert len(out) == 6  # left-outer: every left row survives


def test_asof_forward_and_tolerance(spark, frames):
    left, right = frames
    fwd = {
        r.lid: r.right_rv
        for r in asof_join(left, right, "k", "lts", "rts", direction="forward").collect()
    }
    # earliest right at-or-after
    assert fwd[100] == 1.0 and fwd[101] == 3.0 and fwd[102] == 1.0
    assert fwd[200] is None  # 11:00 right is before 12:00 left

    tol = {
        r.lid: r.right_rv
        for r in asof_join(
            left, right, "k", "lts", "rts", tolerance_seconds=900
        ).collect()
    }
    assert tol[100] == 1.0  # 0s away
    assert tol[101] is None  # 30min > 15min tolerance -> nulled out
    assert tol[200] is None  # 60min away


def test_asof_output_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("right_rv", F.lit(1)), right, "k", "lts", "rts")


def test_asof_plan_has_no_join_single_shuffle(spark, frames):
    left, right = frames
    plan = asof_join(left, right, "k", "lts", "rts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union-window rewrite: no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_range_join_containment_and_multi_bucket(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:30:00")),
            (1, 11, _ts("2024-01-01 13:59:59")),
            (1, 12, _ts("2024-01-01 14:00:01")),  # past end
            (2, 20, _ts("2024-01-01 10:30:00")),  # wrong key
        ],
        "k long, pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        # 4h interval spans many 30min buckets -> explode, but each
        # (point, interval) pair must appear exactly once.
        [(1, 900, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 14:00:00"))],
        "k long, iid long, st timestamp, en timestamp",
    )
    got = interval_range_join(
        points, intervals, "pts", "st", "en", on="k", bucket_seconds=1800
    ).collect()
    assert sorted((r.pid, r.iid) for r in got) == [(10, 900), (11, 900)]


def test_range_join_inclusive_bounds_and_guard(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2024-01-01 11:00:00"))],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, st timestamp, en timestamp",
    )
    got = interval_range_join(points, intervals, "pts", "st", "en", bucket_seconds=3600)
    assert sorted(r.pid for r in got.collect()) == [1, 2]  # both endpoints inclusive

    with pytest.raises(Exception, match="too many buckets"):
        interval_range_join(
            points, intervals, "pts", "st", "en",
            bucket_seconds=1, max_buckets_per_interval=10,
        ).collect()


def test_range_join_column_collision_raises(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "x long, pts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "x long, st timestamp, en timestamp",
    )
    with pytest.raises(ValueError, match="collision"):
        interval_range_join(df, iv, "pts", "st", "en")  # x clashes (no on=)
