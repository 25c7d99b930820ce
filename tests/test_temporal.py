"""Unit tests for operators/temporal.py — as-of and interval range
joins (edge semantics + plan shape; full-oracle parity runs in
test_queries_vs_duckdb.py via the registered queries).

All fixtures are parametrized over TIMESTAMP and TIMESTAMP_NTZ: the
driver parquet stores tz-less timestamps which Spark reads as NTZ, and
round 3 shipped an `unix_micros`-rejects-NTZ analysis bug precisely
because these fixtures only built tz-aware rows.
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_project_spark.operators.temporal import (
    asof_join,
    interval_range_join,
)

TS_VARIANTS = ["tz", "ntz"]


def _mk_ts(variant):
    if variant == "ntz":
        return lambda s: datetime.fromisoformat(s)
    return lambda s: datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _ts_type(variant):
    return T.TimestampNTZType() if variant == "ntz" else T.TimestampType()


def _ts_ddl(variant):
    return "timestamp_ntz" if variant == "ntz" else "timestamp"


@pytest.fixture(params=TS_VARIANTS)
def ts_variant(request):
    return request.param


@pytest.fixture()
def frames(spark, ts_variant):
    ts = _mk_ts(ts_variant)
    left_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("lid", T.LongType()),
            T.StructField("lts", _ts_type(ts_variant)),
        ]
    )
    right_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rts", _ts_type(ts_variant)),
            T.StructField("rv", T.DoubleType()),
        ]
    )
    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00")),  # matches rv=1.0 (exact tie)
            (1, 101, ts("2024-01-01 12:30:00")),  # matches rv=2.0
            (1, 102, ts("2024-01-01 09:00:00")),  # before all rights -> null
            (2, 200, ts("2024-01-01 12:00:00")),  # other key
            (3, 300, ts("2024-01-01 12:00:00")),  # key absent on right
            (None, 400, ts("2024-01-01 12:00:00")),  # null key passes through
        ],
        left_schema,
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1.0),
            (1, ts("2024-01-01 12:00:00"), 2.0),
            (1, ts("2024-01-01 13:00:00"), 3.0),
            (2, ts("2024-01-01 11:00:00"), 9.0),
            (None, ts("2024-01-01 00:00:00"), -1.0),  # null key never matches
        ],
        right_schema,
    )
    return left, right


def _naive(s: str):
    return datetime.fromisoformat(s)


def test_asof_backward(spark, frames, ts_variant):
    left, right = frames
    out_df = asof_join(left, right, "k", "lts", "rts")
    # ts_out keeps the right side's timestamp flavor
    assert out_df.schema["right_rts"].dataType == _ts_type(ts_variant)
    out = {r.lid: (r.right_rts, r.right_rv) for r in out_df.collect()}
    assert out[100] == (_naive("2024-01-01 10:00:00"), 1.0)  # tie matches
    assert out[101] == (_naive("2024-01-01 12:00:00"), 2.0)
    assert out[102] == (None, None)  # nothing at-or-before
    assert out[200] == (_naive("2024-01-01 11:00:00"), 9.0)
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


def test_range_join_containment_and_multi_bucket(spark, ts_variant):
    ts, ddl = _mk_ts(ts_variant), _ts_ddl(ts_variant)
    points = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:30:00")),
            (1, 11, ts("2024-01-01 13:59:59")),
            (1, 12, ts("2024-01-01 14:00:01")),  # past end
            (2, 20, ts("2024-01-01 10:30:00")),  # wrong key
        ],
        f"k long, pid long, pts {ddl}",
    )
    intervals = spark.createDataFrame(
        # 4h interval spans many 30min buckets -> explode, but each
        # (point, interval) pair must appear exactly once.
        [(1, 900, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00"))],
        f"k long, iid long, st {ddl}, en {ddl}",
    )
    got = interval_range_join(
        points, intervals, "pts", "st", "en", on="k", bucket_seconds=1800
    ).collect()
    assert sorted((r.pid, r.iid) for r in got) == [(10, 900), (11, 900)]


def test_range_join_inclusive_bounds_and_guard(spark, ts_variant):
    ts, ddl = _mk_ts(ts_variant), _ts_ddl(ts_variant)
    points = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00")), (2, ts("2024-01-01 11:00:00"))],
        f"pid long, pts {ddl}",
    )
    intervals = spark.createDataFrame(
        [(7, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))],
        f"iid long, st {ddl}, en {ddl}",
    )
    got = interval_range_join(points, intervals, "pts", "st", "en", bucket_seconds=3600)
    assert sorted(r.pid for r in got.collect()) == [1, 2]  # both endpoints inclusive

    with pytest.raises(Exception, match="too many buckets"):
        interval_range_join(
            points, intervals, "pts", "st", "en",
            bucket_seconds=1, max_buckets_per_interval=10,
        ).collect()


def test_range_join_column_collision_raises(spark):
    df = spark.createDataFrame([(1, _naive("2024-01-01 10:00:00"))], "x long, pts timestamp")
    iv = spark.createDataFrame(
        [(1, _naive("2024-01-01 09:00:00"), _naive("2024-01-01 11:00:00"))],
        "x long, st timestamp, en timestamp",
    )
    with pytest.raises(ValueError, match="collision"):
        interval_range_join(df, iv, "pts", "st", "en")  # x clashes (no on=)


# ---- interval-overlap join -------------------------------------------------

def _iv(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}_id long, k string, {prefix}_s timestamp, {prefix}_e timestamp"
    )


def test_interval_overlap_matches_bruteforce_any_bucket(spark):
    """The canonical-bucket dedup emits every overlapping pair exactly
    once, for bucket widths smaller, comparable, and larger than the
    interval lengths."""
    from datetime import datetime

    from data_pipeline_project_spark.operators.temporal import interval_overlap_join

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = _iv(
        spark,
        [
            (1, "u", t(0), t(3)),     # long interval
            (2, "u", t(5), t(5, 30)),
            (3, "v", t(1), t(2)),
            (4, "u", t(9), t(10)),    # touches 5's start exactly
        ],
        "l",
    )
    right = _iv(
        spark,
        [
            (10, "u", t(2), t(6)),    # overlaps 1 and 2
            (11, "u", t(3), t(4)),    # touches 1's end exactly
            (12, "v", t(1, 30), t(1, 45)),  # inside 3
            (13, "u", t(10), t(11)),  # touches 4's end
            (14, "w", t(0), t(23)),   # no matching key
        ],
        "r",
    )
    expect = set()
    lrows = left.collect()
    for lr in lrows:
        for rr in right.collect():
            if lr.k == rr.k and lr.l_s <= rr.r_e and rr.r_s <= lr.l_e:
                expect.add((lr.l_id, rr.r_id))

    for bucket in (600, 3600, 86400):
        got = [
            (r.l_id, r.r_id)
            for r in interval_overlap_join(
                left, right, "l_s", "l_e", "r_s", "r_e",
                on="k", bucket_seconds=bucket,
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicates at bucket={bucket}"
        assert set(got) == expect, (bucket, sorted(got))


def test_interval_overlap_guard_and_collision(spark):
    import pytest as _pytest
    from datetime import datetime

    from data_pipeline_project_spark.operators.temporal import interval_overlap_join

    left = _iv(spark, [(1, "u", datetime(2024, 1, 1), datetime(2024, 3, 1))], "l")
    right = _iv(spark, [(2, "u", datetime(2024, 1, 5), datetime(2024, 1, 6))], "r")
    with _pytest.raises(Exception, match="too many buckets"):
        interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e",
            on="k", bucket_seconds=60, max_buckets_per_interval=100,
        ).collect()
    with _pytest.raises(ValueError, match="collision"):
        interval_overlap_join(
            left, left.withColumnRenamed("l_id", "x_id"),
            "l_s", "l_e", "l_s", "l_e", on="k",
        )
    # inputs carrying the internal helper names must error, not corrupt
    with _pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(
            left.withColumn("_ov_l_lo", F.lit(0)), right,
            "l_s", "l_e", "r_s", "r_e", on="k",
        )
    with _pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(
            left, right.withColumn("_rj_bucket", F.lit(0)),
            "l_s", "l_e", "r_s", "r_e", on="k",
        )
