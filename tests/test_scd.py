"""SCD2 merge (operators/scd.py) unit semantics: version chaining,
no-op collapse, closed-history passthrough, new keys, null attrs."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.scd import scd2_merge

D = dt.date


@pytest.fixture(scope="module")
def dim(spark):
    # key 1: open 'a' since 2020; key 2: closed 'x' 2019->2020 then open
    # 'y'; key 3: open 'q', untouched by any change.
    return spark.createDataFrame(
        [
            (1, "a", D(2020, 1, 1), None),
            (2, "x", D(2019, 1, 1), D(2020, 1, 1)),
            (2, "y", D(2020, 1, 1), None),
            (3, "q", D(2020, 1, 1), None),
        ],
        "k int, attr string, valid_from date, valid_to date",
    )


def _merge(dim, changes):
    return scd2_merge(
        dim, changes, key_col="k", attr_cols=["attr"],
        change_ts_col="ts", order_cols=["seq"],
    )


def _rows(df):
    return sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to) for r in df.collect()),
        key=lambda t: (t[0], t[1] or "", t[2]),
    )


def test_chain_with_noop_collapse(spark, dim):
    changes = spark.createDataFrame(
        # key 1: a(noop) -> b -> b(noop) -> c ; same-day tiebreak by seq
        [
            (1, "a", D(2021, 1, 1), 1),
            (1, "b", D(2021, 6, 1), 2),
            (1, "b", D(2021, 7, 1), 3),
            (1, "c", D(2021, 8, 1), 4),
        ],
        "k int, attr string, ts date, seq long",
    )
    got = _rows(_merge(dim, changes).where(F.col("k") == 1))
    assert got == [
        (1, "a", D(2020, 1, 1), D(2021, 6, 1)),  # noop change didn't split
        (1, "b", D(2021, 6, 1), D(2021, 8, 1)),  # consecutive b collapsed
        (1, "c", D(2021, 8, 1), None),
    ]


def test_closed_history_and_untouched_keys_pass_through(spark, dim):
    changes = spark.createDataFrame(
        [(1, "z", D(2022, 1, 1), 1)], "k int, attr string, ts date, seq long"
    )
    out = _merge(dim, changes)
    assert _rows(out.where(F.col("k") == 2)) == [
        (2, "x", D(2019, 1, 1), D(2020, 1, 1)),
        (2, "y", D(2020, 1, 1), None),
    ]
    assert _rows(out.where(F.col("k") == 3)) == [(3, "q", D(2020, 1, 1), None)]


def test_new_key_inserted(spark, dim):
    changes = spark.createDataFrame(
        [(9, "n1", D(2021, 1, 1), 1), (9, "n2", D(2021, 2, 1), 2)],
        "k int, attr string, ts date, seq long",
    )
    assert _rows(_merge(dim, changes).where(F.col("k") == 9)) == [
        (9, "n1", D(2021, 1, 1), D(2021, 2, 1)),
        (9, "n2", D(2021, 2, 1), None),
    ]


def test_same_timestamp_orders_by_tiebreak(spark, dim):
    changes = spark.createDataFrame(
        [(1, "late", D(2021, 1, 1), 2), (1, "early", D(2021, 1, 1), 1)],
        "k int, attr string, ts date, seq long",
    )
    got = _rows(_merge(dim, changes).where(F.col("k") == 1))
    assert got == [
        (1, "a", D(2020, 1, 1), D(2021, 1, 1)),
        # both changes share the date: early's interval is empty but
        # ordered first; late stays open
        (1, "early", D(2021, 1, 1), D(2021, 1, 1)),
        (1, "late", D(2021, 1, 1), None),
    ]


def test_null_attr_is_distinct_from_value(spark):
    dim = spark.createDataFrame(
        [(1, "a", D(2020, 1, 1), None)],
        "k int, attr string, valid_from date, valid_to date",
    )
    changes = spark.createDataFrame(
        [(1, None, D(2021, 1, 1), 1), (1, None, D(2021, 2, 1), 2)],
        "k int, attr string, ts date, seq long",
    )
    assert _rows(_merge(dim, changes)) == [
        (1, None, D(2021, 1, 1), None),  # null != 'a'; null == null noop
        (1, "a", D(2020, 1, 1), D(2021, 1, 1)),
    ]


def test_one_shuffle_plan(spark, dim):
    changes = spark.createDataFrame(
        [(1, "z", D(2022, 1, 1), 1)], "k int, attr string, ts date, seq long"
    )
    plan = _merge(dim, changes)._jdf.queryExecution().executedPlan().toString()
    # Every shuffle touches only change-bounded data: the changed-key
    # distinct (recomputed once per broadcast consumer: anti, semi, and
    # the stale-guard's cur_from) and ONE versioning window exchange
    # reused by lag AND lead, whose input is changes + the touched
    # current rows — bounded by the batch, not the dimension. The
    # dimension side itself never shuffles or sort-merge-joins.
    assert plan.count("hashpartitioning") <= 5, plan
    assert plan.count("Window ") == 2  # lag + lead share one exchange
    assert "SortMergeJoin" not in plan


def test_stale_change_before_open_version_is_discarded(spark, dim):
    """A change timestamped before its key's open version began must
    not rewrite history (the out-of-order contract in the docstring)."""
    changes = spark.createDataFrame(
        # key 1's open 'a' version began 2020-01-01
        [(1, "old", D(2019, 6, 1), 1), (1, "b", D(2021, 1, 1), 2)],
        "k int, attr string, ts date, seq long",
    )
    got = _rows(_merge(dim, changes).where(F.col("k") == 1))
    assert got == [
        (1, "a", D(2020, 1, 1), D(2021, 1, 1)),  # start unchanged
        (1, "b", D(2021, 1, 1), None),
    ]
