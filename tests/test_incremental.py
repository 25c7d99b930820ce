"""Incremental-ingest dedup (operators/incremental.py): the Bloom
prefilter must be invisible in the answer (== exact left_anti) and
visible in the plan (historical side never shuffles)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.incremental import (
    bloom_might_contain,
    bloom_parameters,
    build_bloom,
    incremental_dedup,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # historical: keys 0..4999; new batch: 500 dups (0..499 * 10) +
    # 500 genuinely new keys (odd ids above the historical range).
    hist = spark.range(0, 5000).select(
        (F.col("id") * 10).alias("doc_key"), F.lit("hist").alias("origin")
    )
    new = spark.range(0, 1000).select(
        F.when(F.col("id") < 500, F.col("id") * 10)
        .otherwise(F.col("id") * 10 + 1)
        .alias("doc_key"),
        F.lit("new").alias("origin"),
    )
    return hist, new


def test_matches_exact_anti_join(spark, corpus):
    hist, new = corpus
    got = sorted(
        r.doc_key for r in incremental_dedup(new, hist, "doc_key").collect()
    )
    want = sorted(
        r.doc_key for r in new.join(hist, "doc_key", "left_anti").collect()
    )
    assert got == want
    assert len(got) == 500  # the planted genuinely-new half


def test_plan_never_shuffles_historical(spark, corpus):
    hist, new = corpus
    plan = incremental_dedup(new, hist, "doc_key")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan  # zero shuffle exchanges
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_false_positive_rate_bounded(spark):
    n, fpp = 20_000, 0.01
    hist = spark.range(0, n).select(F.col("id").alias("k"))
    bitmap, m_bits, k = build_bloom(hist, "k", expected_items=n, fpp=fpp)
    probe = spark.range(n, 2 * n).select(F.col("id").alias("k"))
    from data_pipeline_project_spark.operators.incremental import _hash_cols

    might = bloom_might_contain(spark, bitmap, m_bits, k)
    hits = (
        _hash_cols(probe, "k")
        .where(might(F.col("_bf_h1"), F.col("_bf_h2")))
        .count()
    )
    assert hits / n < 5 * fpp  # generous slack over the design point


def test_no_false_negatives(spark):
    n = 5_000
    hist = spark.range(0, n).select(F.col("id").alias("k"))
    bitmap, m_bits, k = build_bloom(hist, "k", expected_items=n, fpp=0.01)
    from data_pipeline_project_spark.operators.incremental import _hash_cols

    might = bloom_might_contain(spark, bitmap, m_bits, k)
    hits = (
        _hash_cols(hist, "k").where(might(F.col("_bf_h1"), F.col("_bf_h2"))).count()
    )
    assert hits == n


def test_tree_combine_matches_direct(spark):
    hist = spark.range(0, 3_000).select(F.col("id").alias("k")).repartition(8)
    direct, m1, k1 = build_bloom(hist, "k", expected_items=3_000, combine_fanin=64)
    treed, m2, k2 = build_bloom(hist, "k", expected_items=3_000, combine_fanin=2)
    assert (m1, k1) == (m2, k2)
    assert np.array_equal(
        np.frombuffer(direct, dtype=np.uint8), np.frombuffer(treed, dtype=np.uint8)
    )


def test_null_keys_follow_anti_join_semantics(spark):
    hist = spark.createDataFrame([(1,), (None,)], "k int")
    new = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    got = sorted(
        (r.k is None, r.k or 0)
        for r in incremental_dedup(new, hist, "k").collect()
    )
    want = sorted(
        (r.k is None, r.k or 0)
        for r in new.join(hist, "k", "left_anti").collect()
    )
    assert got == want  # null-key row survives in both


def test_parameter_formula():
    m, k = bloom_parameters(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000  # ~9.59 bits/key at 1% fpp
    assert k in (6, 7)
    assert m % 8 == 0


def test_property_equivalence_with_left_anti(spark):
    """Randomized equivalence: for varied overlap shapes (disjoint,
    subset, superset, dup keys in the batch), incremental_dedup must
    equal plain left_anti. Driven by hypothesis over key sets; one
    session evaluates all examples."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.lists(st.integers(0, 30), min_size=0, max_size=25)

    @given(hist_keys=keys, new_keys=keys)
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def check(hist_keys, new_keys):
        hist = spark.createDataFrame(
            [(k,) for k in set(hist_keys)] or [(None,)], "k int"
        ).where(F.col("k").isNotNull())
        new = spark.createDataFrame(
            [(k, i) for i, k in enumerate(new_keys)] or [(None, None)],
            "k int, rowid int",
        ).where(F.col("k").isNotNull())
        got = sorted(
            (r.k, r.rowid)
            for r in incremental_dedup(new, hist, "k", fpp=0.2).collect()
        )
        want = sorted(
            (r.k, r.rowid) for r in new.join(hist, "k", "left_anti").collect()
        )
        assert got == want

    check()


# ---- aggregate state: merge / retract / repair ------------------------------

def test_retract_flags_only_extreme_touching_groups(spark):
    from data_pipeline_project_spark.operators.incremental import (
        aggregate_state,
        retract_aggregate_state,
    )

    facts = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 9.0),
         ("b", 2.0), ("b", 4.0), ("b", 6.0),
         ("c", 7.0), ("c", 8.0)],
        "k string, v double",
    )
    # deletes: a's middle value (clean), b's max (stale), all of c (gone)
    deletes = spark.createDataFrame(
        [("a", 5.0), ("b", 6.0), ("c", 7.0), ("c", 8.0)], "k string, v double"
    )
    st = aggregate_state(facts, ["k"], "v")
    dst = aggregate_state(deletes, ["k"], "v")
    out = {r.k: r for r in retract_aggregate_state(st, dst).collect()}

    assert set(out) == {"a", "b"}          # c fully deleted -> dropped
    assert not out["a"]._st_minmax_stale   # 5.0 inside (1, 9)
    assert out["b"]._st_minmax_stale       # 6.0 was b's max
    assert out["a"]._st_n == 2 and float(out["a"]._st_sum) == 10.0
    assert out["b"]._st_n == 2 and float(out["b"]._st_sum) == 6.0


def test_repair_scans_only_stale_groups_and_is_exact(spark):
    from data_pipeline_project_spark.operators.incremental import (
        aggregate_state,
        finalize_aggregate_state,
        repair_aggregate_state,
        retract_aggregate_state,
    )

    facts = spark.range(0, 1000).selectExpr(
        "id % 50 as k", "cast(id as double) as v"
    )
    deletes = facts.where("v % 3 = 0")
    remaining = facts.where("v % 3 != 0")

    adjusted = retract_aggregate_state(
        aggregate_state(facts, ["k"], "v"), aggregate_state(deletes, ["k"], "v")
    )
    repaired = repair_aggregate_state(adjusted, remaining, "v")
    got = {
        r.k: (r.n_rows, r.sum_value, r.min_value, r.max_value)
        for r in finalize_aggregate_state(repaired).collect()
    }
    want = {
        r.k: (r.n_rows, r.sum_value, r.min_value, r.max_value)
        for r in finalize_aggregate_state(
            aggregate_state(remaining, ["k"], "v")
        ).collect()
    }
    assert got == want

    # the repair scan is pruned: remaining facts enter via a broadcast
    # left-semi join on the stale keys, never a full re-aggregation of
    # clean groups
    plan = repaired._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan


def test_retract_all_null_delete_batch_keeps_group(spark):
    """A delete batch whose values are all NULL for a group must leave
    the group present and unflagged (regression: a null stale flag was
    dropped by both repair branches)."""
    from data_pipeline_project_spark.operators.incremental import (
        aggregate_state,
        finalize_aggregate_state,
        repair_aggregate_state,
        retract_aggregate_state,
    )

    facts = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "k string, v double"
    )
    deletes = spark.createDataFrame([("a", None)], "k string, v double")
    adjusted = retract_aggregate_state(
        aggregate_state(facts, ["k"], "v"), aggregate_state(deletes, ["k"], "v")
    )
    rows = adjusted.collect()
    assert len(rows) == 1 and not rows[0]._st_minmax_stale
    out = finalize_aggregate_state(
        repair_aggregate_state(adjusted, facts, "v")
    ).collect()
    assert len(out) == 1
    assert (out[0].n_rows, out[0].sum_value) == (2, 3.0)


def test_retract_keeps_group_whose_remaining_rows_are_all_null(spark):
    """Deleting every non-null value while null-valued rows remain must
    keep the group with n=0 (matching a one-shot GROUP BY over the
    survivors), not drop it (regression: _st_n-based liveness)."""
    from data_pipeline_project_spark.operators.incremental import (
        aggregate_state,
        finalize_aggregate_state,
        repair_aggregate_state,
        retract_aggregate_state,
    )

    facts = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", None), ("b", 5.0)],
        "k string, v double",
    )
    deletes = spark.createDataFrame([("a", 1.0)], "k string, v double")
    remaining = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 5.0)], "k string, v double"
    )
    adjusted = retract_aggregate_state(
        aggregate_state(facts, ["k"], "v"), aggregate_state(deletes, ["k"], "v")
    )
    # group a survives (2 null rows remain) and is flagged stale: its
    # only value was also its min, so repair must null out the stats
    by_k = {r.k: r for r in adjusted.collect()}
    assert set(by_k) == {"a", "b"}
    assert by_k["a"]._st_minmax_stale and by_k["a"]._st_rows == 2
    out = {
        r.k: (r.n_rows, r.sum_value, r.min_value, r.max_value, r.avg_value)
        for r in finalize_aggregate_state(
            repair_aggregate_state(adjusted, remaining, "v")
        ).collect()
    }
    assert out["a"] == (0, None, None, None, None)
    assert out["b"] == (1, 5.0, 5.0, 5.0, 5.0)
