"""Model-based document quality filtering — the classifier tier of a
modern pre-training pipeline (the GPT-3 / CCNet / DCLM recipe: train a
cheap linear classifier to imitate a "high quality" reference, score
the whole corpus, keep the top mass). The heuristic tiers
(operators/text.quality_score, corpus.repetition_flags,
unigram_logprob_score) catch structural junk; the classifier catches
what rules can't describe.

Spark-first shape: features are a stateless hashing projection
(HashingTF — no vocabulary state to ship), IDF is one aggregate over
the corpus, and logistic regression's LBFGS does one treeAggregate per
iteration — every stage is already the distributed implementation, so
the same pipeline trains on 100 TB with executor count as the only
knob. Scoring is a pure map (broadcast model).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same token contract as operators/text.tokens — import the shared
# regex so the classifier can't silently drift from the heuristic tiers.
from data_pipeline_project_spark.operators.text import TOKEN_SPLIT_RE as _TOKEN_PATTERN


def quality_pipeline(
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> Pipeline:
    """tokenize → hash-TF → IDF → logistic regression. Deterministic:
    hashing is stateless, IDF is exact, LBFGS from a zero init has no
    randomness."""
    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="_qm_toks",
        pattern=_TOKEN_PATTERN,
        toLowercase=True,
        minTokenLength=1,
    )
    tf = HashingTF(
        inputCol="_qm_toks", outputCol="_qm_tf", numFeatures=num_features
    )
    idf = IDF(inputCol="_qm_tf", outputCol="_qm_features")
    lr = LogisticRegression(
        featuresCol="_qm_features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    labeled_docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    **kwargs,
) -> PipelineModel:
    """Fit the quality pipeline on (text, label in {0.0, 1.0}) rows —
    label 1.0 = reference-quality. Callers typically label with a
    trusted slice as positives and heuristic-flagged junk (repetition /
    gibberish) as negatives, then let the model generalize."""
    return quality_pipeline(text_col, label_col, **kwargs).fit(labeled_docs)


def score_quality(
    model: PipelineModel, docs: DataFrame, prob_col: str = "quality_prob"
) -> DataFrame:
    """Append P(quality) to the corpus; one distributed map, no
    shuffle. Downstream: threshold, or sample proportional to score
    (the DCLM top-mass selection)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn(prob_col, F.round(p1, 6)).drop(
        "_qm_toks", "_qm_tf", "_qm_features",
        "rawPrediction", "probability", "prediction",
    )


def select_top_mass(
    scored: DataFrame,
    keep_frac: float,
    prob_col: str = "quality_prob",
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep approximately the top ``keep_frac`` of documents by
    quality score — the DCLM-style selection step after scoring.

    A global sort-and-cut is a full-corpus Exchange; instead the score
    threshold comes from ``approx_percentile`` (one mergeable-sketch
    aggregate, rank error bounded by ``relative_error`` — the same
    guarantee the approx_quantile_accuracy oracle row pins), and
    selection is then a pure filter. Ties at the threshold are kept,
    so the kept fraction can exceed ``keep_frac`` by the tie mass +
    sketch error; at corpus scale with 6-decimal scores both are
    negligible."""
    import math

    from data_pipeline_project_spark.functions.persist_scope import scoped_persist

    # The scored frame is read twice (threshold sketch, then the kept
    # filter) — persist it so the scoring pipeline runs once.
    scored = scoped_persist(scored)
    q = 1.0 - keep_frac
    # ceil keeps the documented rank-error bound for non-divisor errors
    # (int() would truncate 1/0.003 to 333 -> bound 1/333 > 0.003).
    accuracy = max(1, math.ceil(1.0 / relative_error))
    thresh_row = scored.agg(
        F.percentile_approx(
            F.col(prob_col), F.lit(q), F.lit(accuracy)
        ).alias("t")
    ).collect()[0]
    return scored.where(F.col(prob_col) >= F.lit(thresh_row["t"]))
