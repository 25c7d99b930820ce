"""Persisted IVF index (operators/similarity.build_ivf_index /
query_ivf_index): serving parity with the inline operator, and the
partition-pruned-scan contract that makes it the 100 TB shape."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.similarity import (
    build_ivf_index,
    ivf_cosine_topk,
    query_ivf_index,
    train_ivf_centroids,
)
from data_pipeline_project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank) for r in df.collect()
    )


def test_persisted_index_matches_inline_operator(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    queries = emb.where(F.col("vec_id") < 8)
    cents = train_ivf_centroids(emb, n_list=8)

    build_ivf_index(emb, str(tmp_path / "idx"), n_list=8, centroids=cents)
    served = query_ivf_index(
        spark, str(tmp_path / "idx"), queries, k=5, n_probe=4
    )
    inline = ivf_cosine_topk(
        emb, queries, k=5, n_list=8, n_probe=4, centroids=cents
    )
    assert _rows(served) == _rows(inline)


def test_index_query_scan_is_partition_pruned(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    queries = emb.where(F.col("vec_id") < 2)
    build_ivf_index(emb, str(tmp_path / "idx"), n_list=8)

    served = query_ivf_index(
        spark, str(tmp_path / "idx"), queries, k=5, n_probe=2
    )
    # The probe list must reach the scan as a PARTITION filter
    # (metadata-level prune of the file index — only the probed lists'
    # directories are listed/read), not a post-scan row filter.
    plan = served._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "list_id" in pf[1][:200], plan
    # <= 2 queries x 2 probes -> at most 4 of the 8 lists are probed,
    # and every candidate the (pruned) scan produced sits in one
    assert served.count() > 0
    q_lists = (
        queries.select(F.col("vec_id"))
        .count()
    )
    assert q_lists == 2  # fixture sanity: 2 query points


def test_centroid_sidecar_roundtrip(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    cents = build_ivf_index(emb, str(tmp_path / "idx"), n_list=4)
    stored = [
        r.centroid
        for r in spark.read.parquet(str(tmp_path / "idx/centroids"))
        .orderBy("centroid_id")
        .collect()
    ]
    assert stored == cents


def test_int8_quantized_vectors_keep_ann_recall(spark, tmp_path):
    """The quantization tier composes with the index tier: serving ANN
    over int8-dequantized vectors recovers most of the full-precision
    top-k (the documented 'small recall cost for 4x storage' trade).
    Shared centroids isolate exactly the quantization effect."""
    emb = load_table(spark, "embeddings", SF)

    def deq(col):
        xd = F.transform(col, lambda e: e.cast("double"))
        scale = F.array_max(F.transform(xd, F.abs)) / F.lit(127.0)
        return F.when(
            scale > 0,
            F.transform(xd, lambda e: F.round(e / scale, 0) * scale),
        ).otherwise(xd)

    emb_q = emb.select("vec_id", deq(F.col("embedding")).alias("embedding"))
    queries = emb.where(F.col("vec_id") < 10)
    cents = train_ivf_centroids(emb, n_list=8)

    build_ivf_index(emb, str(tmp_path / "full"), n_list=8, centroids=cents)
    build_ivf_index(emb_q, str(tmp_path / "int8"), n_list=8, centroids=cents)
    full = {
        (r.query_id, r.neighbor_id)
        for r in query_ivf_index(
            spark, str(tmp_path / "full"), queries, k=10, n_probe=8
        ).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in query_ivf_index(
            spark, str(tmp_path / "int8"), queries, k=10, n_probe=8
        ).collect()
    }
    recall = len(full & quant) / len(full)
    assert recall >= 0.8, f"int8 recall {recall:.2f}"
