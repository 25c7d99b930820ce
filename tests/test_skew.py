"""Salting utilities: exact results + the partition-spreading property."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.functions.skew import (
    SALT_COL,
    salted_broadcast_join,
    salted_sum,
)
from data_pipeline_project_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_salted_sum_matches_plain_groupby(spark):
    li = load_table(spark, "lineitem", SF_ORACLE)
    plain = {
        (r.l_returnflag,): (r.s, r.c)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s"),
             F.count("l_orderkey").alias("c"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.l_quantity_sum, r.l_orderkey_count)
        for r in salted_sum(
            li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(38,6)")),
            ["l_returnflag"],
            {"l_quantity": "sum", "l_orderkey": "count"},
        ).collect()
    }
    assert plain == salted


def test_salted_sum_spreads_hot_key(spark):
    """One key holding 99% of rows must produce n_salts phase-1 groups."""
    df = spark.range(10000).select(
        F.when(F.col("id") < 9900, "HOT").otherwise("cold").alias("k"),
        F.lit(1).alias("v"),
    )
    phase1 = (
        df.withColumn(SALT_COL, (F.rand(seed=42) * 16).cast("int"))
        .groupBy("k", SALT_COL)
        .count()
    )
    hot_parts = phase1.where(F.col("k") == "HOT").count()
    assert hot_parts == 16  # hot key split across all salts
    out = salted_sum(df, ["k"], {"v": "sum"}).collect()
    assert {r.k: r.v_sum for r in out} == {"HOT": 9900, "cold": 100}


def test_salted_broadcast_join_exact(spark):
    orders = load_table(spark, "orders", SF_ORACLE)
    cust = load_table(spark, "customer", SF_ORACLE)
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = salted_broadcast_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        "k",
    ).count()
    assert plain == salted
