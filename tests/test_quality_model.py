"""Model-based quality classifier (operators/quality_model.py):
separates reference-quality text from heuristic-flagged junk and
generalizes to held-out documents."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.quality_model import (
    score_quality,
    train_quality_classifier,
)
from tests.conftest import SF_SMALL


def _labeled_corpus(spark):
    """Positives: real corpus docs. Negatives: synthetic junk — token
    repeats and single-character noise (the shapes repetition filters
    flag), id-disjoint from positives."""
    pos = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("label", F.lit(1.0))
    )
    junk = []
    for i in range(120):
        word = ["spam", "buy", "click", "xxx", "win"][i % 5]
        junk.append((100_000 + i, ((word + " ") * (20 + i % 30)).strip()))
    for i in range(80):
        junk.append((200_000 + i, " ".join(["z"] * (10 + i % 40))))
    neg = spark.createDataFrame(junk, ["doc_id", "text"]).withColumn(
        "label", F.lit(0.0)
    )
    return pos.unionByName(neg)


def test_classifier_separates_heldout_junk_from_text(spark):
    corpus = _labeled_corpus(spark)
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)

    model = train_quality_classifier(train)
    scored = score_quality(model, test)
    rows = scored.select("doc_id", "label", "quality_prob").collect()
    assert rows
    correct = sum(1 for r in rows if (r.quality_prob >= 0.5) == (r.label == 1.0))
    assert correct / len(rows) >= 0.95, f"holdout accuracy {correct}/{len(rows)}"
    # scores are calibrated in the right direction on both classes
    mean_pos = sum(r.quality_prob for r in rows if r.label == 1.0) / max(
        1, sum(1 for r in rows if r.label == 1.0)
    )
    mean_neg = sum(r.quality_prob for r in rows if r.label == 0.0) / max(
        1, sum(1 for r in rows if r.label == 0.0)
    )
    assert mean_pos > 0.8 > 0.2 > mean_neg


def test_scoring_is_pure_projection(spark):
    """Scoring adds no shuffle: the plan of the scored frame contains
    no Exchange (broadcast model, stateless features)."""
    corpus = _labeled_corpus(spark)
    model = train_quality_classifier(corpus)
    scored = score_quality(model, corpus.select("doc_id", "text"))
    assert set(scored.columns) == {"doc_id", "text", "quality_prob"}
    plan = scored._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan, plan


def test_select_top_mass_fraction_and_order(spark):
    """The kept set is (approximately) the highest-scored keep_frac of
    the corpus: kept fraction within sketch tolerance, and every kept
    score >= every dropped score."""
    from data_pipeline_project_spark.operators.quality_model import select_top_mass

    n = 10_000
    scored = spark.range(n).selectExpr(
        "id as doc_id", "round(pmod(xxhash64(id), 1000000) / 1000000.0, 6) as quality_prob"
    )
    kept = select_top_mass(scored, keep_frac=0.2)
    k = kept.count()
    assert 0.19 * n <= k <= 0.22 * n, k
    min_kept = kept.agg(F.min("quality_prob")).collect()[0][0]
    max_dropped = (
        scored.join(kept.select("doc_id"), "doc_id", "left_anti")
        .agg(F.max("quality_prob"))
        .collect()[0][0]
    )
    assert min_kept >= max_dropped


def test_model_save_load_roundtrip(spark, tmp_path):
    """Train-once-score-everywhere: a persisted model reloads and
    produces identical scores (the operational path — the classifier
    trains on a reference slice, ships to every scoring job)."""
    from pyspark.ml import PipelineModel

    corpus = _labeled_corpus(spark)
    model = train_quality_classifier(corpus)
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)

    docs = corpus.select("doc_id", "text").limit(50)
    a = {r.doc_id: r.quality_prob for r in score_quality(model, docs).collect()}
    b = {r.doc_id: r.quality_prob for r in score_quality(reloaded, docs).collect()}
    assert a == b
