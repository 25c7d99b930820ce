"""Digest-descent reconciliation (operators/reconcile.py): row-level
diffs found through Merkle-style bucket digests, never a full-table
exceptAll shuffle."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.reconcile import reconcile_tables


def test_reconcile_finds_exact_row_diffs(spark):
    base = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # right copy: one row mutated, one deleted, one added
    right = (
        base.where("k != 5000")  # deleted
        .withColumn("v", F.when(F.col("k") == 7, F.lit(-1)).otherwise(F.col("v")))
        .unionByName(spark.createDataFrame([(20_000, 3)], ["k", "v"]))
    )
    diff = reconcile_tables(base, right, ["k", "v"]).collect()
    got = {(r.side, r.k, r.v, r.delta) for r in diff}
    assert got == {
        ("left_only", 5000, 5000 % 97, 1),   # deleted on right
        ("left_only", 7, 7 % 97, 1),         # old version of mutated row
        ("right_only", 7, -1, 1),            # new version
        ("right_only", 20_000, 3, 1),        # added on right
    }


def test_reconcile_identical_tables_and_multiplicity(spark):
    a = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    assert reconcile_tables(a, a, ["k", "v"]).count() == 0

    # duplicate-row multiplicity: right has row k=3 TWICE
    dup = a.unionByName(spark.createDataFrame([(3, 3 % 13)], ["k", "v"]))
    d = reconcile_tables(a, dup, ["k", "v"]).collect()
    assert [(r.side, r.k, r.delta) for r in d] == [("right_only", 3, 1)]


def test_reconcile_prunes_clean_buckets(spark):
    """The level-1 prune must cut the suspect set to the differing
    buckets: with one mutated row out of 10k and fanout 64, the rows
    surviving level 1 are ~2/64ths of the table, not the table."""
    from data_pipeline_project_spark.operators.reconcile import row_hash

    base = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = base.withColumn(
        "v", F.when(F.col("k") == 7, F.lit(-1)).otherwise(F.col("v"))
    )
    # replicate level 1 manually: digests differ in at most 2 buckets
    lh = base.select(row_hash(["k", "v"]).alias("h"))
    rh = right.select(row_hash(["k", "v"]).alias("h"))
    lb = {r[0] for r in lh.select((F.col("h") % 64).alias("b")).distinct().collect()}
    diff_buckets = (
        lh.groupBy((F.col("h") % 64).alias("b"))
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("d"))
        .join(
            rh.groupBy((F.col("h") % 64).alias("b"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("d2")),
            "b",
        )
        .where("d != d2")
        .count()
    )
    assert 1 <= diff_buckets <= 2 and len(lb) == 64


def test_reconcile_matches_simulator_on_random_edits(spark):
    """Randomized property: for random edit sets (delete/mutate/add),
    the digest descent returns exactly the symmetric difference with
    multiplicities — agreeing with a pure-Python reference diff."""
    import random
    from collections import Counter

    for seed in (3, 17, 41):
        rng = random.Random(seed)
        left_rows = [(k, k % 11) for k in range(500)]
        right_rows = list(left_rows)
        # random deletes
        for _ in range(rng.randint(0, 5)):
            right_rows.pop(rng.randrange(len(right_rows)))
        # random mutations
        for _ in range(rng.randint(0, 5)):
            i = rng.randrange(len(right_rows))
            k, v = right_rows[i]
            right_rows[i] = (k, v + 100)
        # random adds (incl. duplicates of existing rows)
        for _ in range(rng.randint(0, 5)):
            right_rows.append(rng.choice(left_rows + [(9999, 1)]))

        expect = Counter(left_rows) - Counter(right_rows)
        expect_r = Counter(right_rows) - Counter(left_rows)

        l = spark.createDataFrame(left_rows, ["k", "v"])
        r = spark.createDataFrame(right_rows, ["k", "v"])
        got = reconcile_tables(l, r, ["k", "v"], fanout=16, max_levels=2).collect()
        got_l = {(x.k, x.v): x.delta for x in got if x.side == "left_only"}
        got_r = {(x.k, x.v): x.delta for x in got if x.side == "right_only"}
        assert got_l == dict(expect), (seed, got_l, dict(expect))
        assert got_r == dict(expect_r), (seed, got_r, dict(expect_r))
