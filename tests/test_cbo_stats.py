"""CBO statistics (functions/stats.py): column stats flip a filtered
star join from shuffle to broadcast — the plan change IS the point."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.functions.stats import collect_table_stats


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_column_stats_flip_filtered_join_to_broadcast(spark, tmp_path):
    confs = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.statistics.histogram.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024),
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbo_t LOCATION '{tmp_path}/wh'")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.range(0, 200_000).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
        ).write.mode("overwrite").saveAsTable("cbo_t.fact")
        spark.range(0, 50_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("cat"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        ).write.mode("overwrite").saveAsTable("cbo_t.dim")

        def join_df():
            return spark.table("cbo_t.fact").join(
                spark.table("cbo_t.dim").where(F.col("cat") == 7), "k"
            )

        # without stats the filtered dim is costed at full file size:
        # too big to broadcast under the tight threshold
        before = _plan(spark, join_df())
        assert "BroadcastHashJoin" not in before, before

        stats = collect_table_stats(spark, "cbo_t.dim")
        collect_table_stats(spark, "cbo_t.fact", columns=[])
        assert "bytes" in stats.get("table", ""), stats

        # with NDV/histograms the 0.1% filter is estimated small: broadcast
        after = _plan(spark, join_df())
        assert "BroadcastHashJoin" in after, after

        # and the answer is unchanged
        assert join_df().count() == 50
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP DATABASE IF EXISTS cbo_t CASCADE")
