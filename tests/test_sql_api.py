"""The SQL front door: the engine's surface is equally reachable via
spark.sql over registered temp views — the DataFrame plans and the SQL
dialect compile to the SAME Catalyst plans, so results are identical.
(The DuckDB oracle strings check cross-ENGINE semantics; this checks
the intra-engine API parity a SQL-first user relies on.)"""

from pyspark.sql import functions as F

from data_pipeline_project_spark.plans.registry import get_queries
from data_pipeline_project_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _register(spark, names):
    for n in names:
        load_table(spark, n, SF_ORACLE).createOrReplaceTempView(n)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_q1_matches_dataframe_plan(spark):
    _register(spark, ["lineitem"])
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
                   AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)
    df = get_queries()["q1_pricing_summary"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_window_and_qualify_shapes(spark):
    """Windows, CTEs, and lateral column references through the SQL
    door — the shapes a SQL-first analyst writes daily."""
    _register(spark, ["orders"])
    sql = spark.sql("""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
        )
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM ranked WHERE rk <= 3
    """)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    df = (
        load_table(spark, "orders", SF_ORACLE)
        .withColumn("rk", F.row_number().over(w))
        .where("rk <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    assert _rows(sql) == _rows(df)


def test_sql_join_semi_anti_syntax(spark):
    """LEFT SEMI / LEFT ANTI join syntax through SQL equals the
    DataFrame API's join types."""
    _register(spark, ["customer", "orders"])
    sql = spark.sql("""
        SELECT c_custkey FROM customer
        LEFT SEMI JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'F'
    """)
    c = load_table(spark, "customer", SF_ORACLE)
    o = load_table(spark, "orders", SF_ORACLE).where("o_orderstatus = 'F'")
    df = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    assert _rows(sql) == _rows(df)
