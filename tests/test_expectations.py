"""Unit semantics for the one-pass expectation suite
(operators/expectations.py) beyond its DuckDB oracle parity."""

from data_pipeline_project_spark.operators.expectations import (
    expect_between,
    expect_in,
    expect_not_null,
    expect_regex,
    expect_unique,
    expectation_report,
)


def _report(spark, rows, rules):
    df = spark.createDataFrame(rows, ["k", "v", "s"])
    return {r.rule_name: (r.metric, r.passed) for r in expectation_report(df, rules).collect()}


def test_null_values_fail_predicates(spark):
    out = _report(
        spark,
        [(1, 10.0, "ok"), (2, None, "ok"), (3, 99.0, None)],
        [
            expect_not_null("v"),
            expect_between("v", 0, 50),
            expect_regex("s", "^ok$"),
        ],
    )
    assert out["v_not_null"] == (round(2 / 3, 6), False)
    # null v and out-of-range v both fail the between rule
    assert out["v_between"] == (round(1 / 3, 6), False)
    assert out["s_matches_regex"] == (round(2 / 3, 6), False)


def test_threshold_and_uniqueness(spark):
    out = _report(
        spark,
        [(1, 1.0, "a"), (1, 2.0, "b"), (2, 3.0, "c"), (3, 4.0, "d")],
        [
            expect_unique(["k"]),
            expect_unique(["k", "s"]),
            expect_in("s", ["a", "b", "c"], threshold=0.7),
        ],
    )
    assert out["unique_k"] == (0.75, False)
    assert out["unique_k_s"] == (1.0, True)
    assert out["s_in_set"] == (0.75, True)


def test_empty_table_is_vacuously_green(spark):
    df = spark.createDataFrame([], "k long, v double, s string")
    out = {
        r.rule_name: (r.metric, r.passed)
        for r in expectation_report(
            df, [expect_not_null("v"), expect_unique(["k"])]
        ).collect()
    }
    assert out == {"v_not_null": (1.0, True), "unique_k": (1.0, True)}


def test_suite_is_single_aggregate_job(spark):
    """The whole suite folds into one aggregate over one scan: the plan
    has exactly one pair of partial/final HashAggregates and no join."""
    df = spark.range(100).selectExpr("id as k", "cast(id as double) as v", "'x' as s")
    rep = expectation_report(
        df, [expect_not_null("v"), expect_between("v", 0, 50), expect_unique(["k"])]
    )
    plan = rep._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" not in plan, plan
    assert plan.count("Scan") <= 1, plan


def test_streaming_expectation_monitor(spark, tmp_path):
    """Per-micro-batch quality reports land in the history table, one
    suite row set per batch, metrics matching each batch's content."""
    from data_pipeline_project_spark.operators.expectations import (
        expectation_monitor,
    )

    src = tmp_path / "in"
    src.mkdir()
    hist = str(tmp_path / "history")

    spark.createDataFrame(
        [(1, 10.0), (2, None)], "k long, v double"
    ).coalesce(1).write.mode("overwrite").json(str(src / "b0"))

    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", "1000")
        .json(str(src / "b0"))
    )
    q = (
        stream.writeStream.foreachBatch(
            expectation_monitor([expect_not_null("v"), expect_unique(["k"])], hist)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    rows = spark.read.parquet(hist).collect()
    got = {(r.batch_id, r.rule_name): (r.metric, r.passed) for r in rows}
    assert got[(0, "v_not_null")] == (0.5, False)
    assert got[(0, "unique_k")] == (1.0, True)


def test_threshold_compares_raw_metric_not_rounded(spark):
    """A 1-in-2M violation must fail a strict threshold=1.0 gate even
    though the displayed metric rounds to 1.0."""
    df = spark.range(2_000_000).selectExpr(
        "id as k", "case when id = 0 then null else cast(id as double) end as v"
    )
    out = {
        r.rule_name: r
        for r in expectation_report(df, [expect_not_null("v")]).collect()
    }
    r = out["v_not_null"]
    assert r.metric == 1.0          # display rounds up...
    assert r.passed is False        # ...but the gate sees the raw fraction


def test_unique_counts_null_keys_as_values(spark):
    """NULL key values are values: one NULL-keyed row among unique rows
    is NOT a duplicate (struct semantics, matching SQL count(DISTINCT
    (a, b)))."""
    df = spark.createDataFrame(
        [(1, "x"), (None, "x"), (2, "x")], "k bigint, s string"
    )
    out = {
        r.rule_name: (r.metric, r.passed)
        for r in expectation_report(df, [expect_unique(["k"])]).collect()
    }
    assert out["unique_k"] == (1.0, True)


def test_approx_unique_tracks_exact_within_rsd(spark):
    from data_pipeline_project_spark.operators.expectations import (
        expect_unique_approx,
    )

    # 1M rows, 10% duplicated keys -> true ratio 0.9
    df = spark.range(1_000_000).selectExpr("id % 900000 as k", "'x' as s")
    out = {
        r.rule_name: r
        for r in expectation_report(
            df,
            [expect_unique(["k"]), expect_unique_approx(["k"], threshold=0.85)],
        ).collect()
    }
    exact = out["unique_k"].metric
    approx = out["approx_unique_k"].metric
    assert abs(approx - exact) / exact < 0.05, (exact, approx)
    assert out["approx_unique_k"].passed


def test_expect_unique_auto_picks_exact_then_sketch(spark):
    """Below the cutoff the auto rule IS the exact rule (same name,
    same metric); above it the HLL rule with a sketch-safe threshold."""
    from data_pipeline_project_spark.operators.expectations import (
        expect_unique_auto,
        expectation_report,
    )

    small = spark.range(0, 100).selectExpr("id as k", "id % 7 as v")
    r = expect_unique_auto(small, ["k"], exact_max_rows=1000)
    assert r.name == "unique_k" and r.threshold == 1.0

    big = spark.range(0, 5000).selectExpr("id as k")
    r2 = expect_unique_auto(big, ["k"], exact_max_rows=1000, rsd=0.01)
    assert r2.name == "approx_unique_k"
    # strict 1.0 gate is capped below 1 - 3*rsd on the sketch path
    assert abs(r2.threshold - 0.97) < 1e-9

    rep = {
        row.rule_name: row
        for row in expectation_report(big, [r2]).collect()
    }
    row = rep["approx_unique_k"]
    # HLL at rsd=0.01 on a true key: estimate within a few % of 1.0
    assert row.passed and 0.9 <= row.metric <= 1.1
