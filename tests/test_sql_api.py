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


def test_sql_q3_join_agg_topk(spark):
    """Join -> agg -> ORDER BY/LIMIT through SQL (TakeOrderedAndProject
    shape) equals the DataFrame q3 plan, including the decimal-exact
    revenue sum and the orderkey tie-break."""
    _register(spark, ["customer", "orders", "lineitem"])
    sql = spark.sql("""
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                    AS DOUBLE) AS revenue,
               o_orderdate
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """)
    df = get_queries()["q3_shipping_priority"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_q5_six_way_star_join(spark):
    """The 6-way TPC-H Q5 star join through SQL — the optimizer is free
    to pick sides; results must equal the explicitly-broadcast
    DataFrame plan."""
    _register(
        spark, ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    )
    sql = spark.sql("""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """)
    df = get_queries()["q5_local_supplier_volume"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_q10_subquery_with_inner_orderby_limit(spark):
    """Join-with-subquery: an ordered-and-limited inner query in the
    FROM clause (TPC-H Q10's top-20) — the subquery's ORDER BY/LIMIT
    must bind inside, not leak to the outer query."""
    _register(spark, ["customer", "orders", "lineitem"])
    sql = spark.sql("""
        SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, c_acctbal
        FROM (
            SELECT c_custkey, c_name,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                       AS revenue,
                   c_acctbal
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        )
    """)
    df = get_queries()["q10_returned_items"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_in_subquery_equals_dataframe_semi_join(spark):
    """IN-subquery through SQL vs an explicit DataFrame left-semi join:
    Catalyst rewrites both to the same semi-join machinery."""
    _register(spark, ["customer", "orders"])
    sql = spark.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """)
    o = load_table(spark, "orders", SF_ORACLE)
    c = load_table(spark, "customer", SF_ORACLE).where(
        "c_mktsegment = 'BUILDING'"
    )
    df = o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )
    assert _rows(sql) == _rows(df)


def test_sql_rollup(spark):
    """GROUP BY ROLLUP through SQL equals DataFrame .rollup(), including
    the null-filled subtotal and grand-total rows."""
    _register(spark, ["lineitem"])
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_price,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)
    df = get_queries()["rollup_revenue"](spark, SF_ORACLE)
    # subtotal rows carry NULL grouping columns, which tuple sort can't
    # order — compare as multisets instead
    from collections import Counter

    assert Counter(map(tuple, sql.collect())) == Counter(map(tuple, df.collect()))


def test_sql_set_operations(spark):
    """UNION / INTERSECT / EXCEPT (distinct semantics) through SQL
    equal the DataFrame set-op plan."""
    _register(spark, ["customer", "orders"])
    sql = spark.sql("""
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        with_f AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_orderstatus = 'F'),
        u AS (SELECT c_custkey FROM building UNION SELECT c_custkey FROM with_f),
        i AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM with_f),
        e AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM with_f)
        SELECT 'union' AS op, count(*) AS n FROM u
        UNION ALL SELECT 'intersect', count(*) FROM i
        UNION ALL SELECT 'except', count(*) FROM e
    """)
    df = get_queries()["set_union_intersect_except"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_ranking_windows(spark):
    """row_number / rank / dense_rank through SQL equal the DataFrame
    window plan (one shuffle serves all three)."""
    _register(spark, ["orders"])
    sql = spark.sql("""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   rank() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS price_rank,
                   dense_rank() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS price_dense_rank
            FROM orders
        ) WHERE rn <= 3
    """)
    df = get_queries()["window_topk_per_group"](spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)


def test_sql_frame_window_lag_lead(spark):
    """Explicit ROWS frame + lag/lead through SQL equal the DataFrame
    running-sum plan (window_running_sum, deregistered but
    oracle-pinned)."""
    from data_pipeline_project_spark.plans.relational_queries import (
        window_running_sum,
    )

    _register(spark, ["orders"])
    sql = spark.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_total,
               lag(o_totalprice)  OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
               lead(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS next_price
        FROM orders
    """)
    df = window_running_sum(spark, SF_ORACLE)
    assert _rows(sql) == _rows(df)
