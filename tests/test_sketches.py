"""Heavy hitters (operators/sketches.py): the candidate set must
contain every true >n/k item, counts must be exact, and the raw data
must never shuffle."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.sketches import heavy_hitters


def _zipfish(spark, n=60_000):
    # value v appears ~ n/(2^v): v=0 ~ half the rows, v=1 a quarter...
    # long tail of near-unique values below.
    return spark.range(0, n).select(
        F.when(F.col("id") % 2 == 0, "hh0")
        .when(F.col("id") % 4 == 1, "hh1")
        .when(F.col("id") % 8 == 3, "hh2")
        .otherwise(F.concat(F.lit("tail"), F.col("id")))
        .alias("term")
    ).repartition(8)


def test_contains_all_true_heavy_hitters_with_exact_counts(spark):
    df = _zipfish(spark)
    n = df.count()
    k = 10
    got = {r.item: r["count"] for r in heavy_hitters(df, "term", k).collect()}
    exact = {
        r.term: r["count"]
        for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("count")).collect()
    }
    for item, cnt in exact.items():
        if cnt > n / k:  # the MG guarantee
            assert item in got, f"missed true heavy hitter {item}"
    for item, cnt in got.items():
        assert cnt == exact[item]  # recount pass is exact, not approx


def test_candidate_set_is_small(spark):
    df = _zipfish(spark)
    k = 10
    # 8 partitions x <= k survivors is the hard bound; in practice the
    # tail items cancel and the set stays near the true hitters.
    assert heavy_hitters(df, "term", k).count() <= 8 * k


def test_raw_data_never_shuffles(spark):
    df = _zipfish(spark)
    plan = (
        heavy_hitters(df, "term", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Only keyed exchanges allowed: the candidate distinct and the
    # partially-aggregated exact counts (both bounded by candidates,
    # not rows). The verify join must be broadcast.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_integer_typed_column(spark):
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 3 == 0, 7).otherwise(F.col("id")).alias("v")
    )
    got = {r.item: r["count"] for r in heavy_hitters(df, "v", 5).collect()}
    assert got[7] == sum(1 for i in range(10_000) if i % 3 == 0 or i == 7)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [(None,)] * 50 + [("b",)] * 5, "v string"
    )
    got = {r.item: r["count"] for r in heavy_hitters(df, "v", 3).collect()}
    assert got["a"] == 50
    assert None not in got


def test_property_guarantee_on_random_distributions(spark):
    """Randomized MG guarantee: whatever the frequency distribution and
    partitioning, every item with freq > n/k appears with its exact
    count."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        vals=st.lists(st.integers(0, 15), min_size=1, max_size=300),
        k=st.sampled_from([3, 5, 8]),
        nparts=st.sampled_from([1, 3, 7]),
    )
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def check(vals, k, nparts):
        df = spark.createDataFrame(
            [(v,) for v in vals], "v int"
        ).repartition(nparts)
        got = {r.item: r["count"] for r in heavy_hitters(df, "v", k).collect()}
        exact = Counter(vals)
        n = len(vals)
        for item, cnt in exact.items():
            if cnt > n / k:
                assert got.get(item) == cnt, (item, cnt, got)
        for item, cnt in got.items():
            assert cnt == exact[item]

    check()


def test_count_min_sketch_merges_counterwise(spark):
    """CMS(A union B) must equal CMS(A) + CMS(B) counter-wise (shared
    deterministic hash family) — the property that lets per-day /
    per-source sketches roll up without rescanning streams."""
    from data_pipeline_project_spark.operators.sketches import (
        count_min_estimates,
        count_min_table,
    )

    a = spark.createDataFrame([(f"t{i % 7}",) for i in range(50)], ["v"])
    b = spark.createDataFrame([(f"t{i % 11}",) for i in range(80)], ["v"])
    both = a.union(b)

    def counters(df):
        return {
            (r.d, r.bucket): r.counter
            for r in count_min_table(df, "v", width=64, depth=3).collect()
        }

    ca, cb, cu = counters(a), counters(b), counters(both)
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cu

    # and the estimate never undercounts on the merged stream
    exact = {r.v: r.n for r in both.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r.item: r.cms_estimate
        for r in count_min_estimates(both, both, "v", width=64, depth=3).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
