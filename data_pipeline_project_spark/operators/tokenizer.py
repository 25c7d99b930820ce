"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-construction step of a training-data pipeline, run on the
corpus the pipeline just cleaned.

The scale shape matters more than the loop: BPE statistics live on the
WORD-FREQUENCY table, not the corpus. A 100 TB corpus collapses to a
vocab of (word, count) rows with one scan + one shuffle (millions of
rows, not billions), and every merge iteration is then:

1. explode each word's adjacent symbol pairs, weighted by word count
   (map-side), aggregate pair counts (one bounded shuffle);
2. take the single best pair — count desc, then lexicographic pair
   asc, so the winner is deterministic across partitionings and runs
   (driver receives ONE row per iteration);
3. apply the merge to each word's symbol array (Arrow-batched kernel,
   embarrassingly parallel), localCheckpoint to keep lineage flat.

No counterpart in the reference (its pipeline stops at cleaned rows:
`pipeline.py` validate->aggregate->store); this extends the LLM-ops
tier. Verified against a single-node textbook BPE implementation in
tests/test_tokenizer.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.text import tokens

END_OF_WORD = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the one pass that touches every
    row; everything after runs on this table."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Character symbols plus the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _merge_kernel_factory(a: str, b: str):
    """Replace every adjacent (a, b) with a+b, left to right."""
    merged = a + b

    def kernel(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            res = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return kernel


def train_bpe(
    docs: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Stops early
    when the best pair occurs fewer than ``min_pair_count`` times.

    The returned merge list IS the tokenizer (apply in order with
    :func:`bpe_segment`). Driver traffic: one (pair, count) row per
    iteration; the vocab table itself never leaves the executors.
    """
    vocab = word_vocab(docs, text_col).select(
        "count", _initial_symbols(F.col("word")).alias("syms")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            "count",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        kernel = _merge_kernel_factory(a, b)
        vocab = vocab.select(
            "count", F.pandas_udf(kernel, "array<string>")(F.col("syms")).alias("syms")
        )
        # Eager per-iteration checkpoint: the vocab table is small (one
        # row per distinct word) and this keeps each iteration's job at
        # one kernel layer instead of re-running the whole merge stack.
        vocab = vocab.localCheckpoint(eager=True)
    return merges


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list as an ordered parquet table
    ``(merge_idx, a, b)`` so the tokenizer can be versioned and reloaded
    by a later pipeline run (a tokenizer that dies with the driver is
    not an artifact). ``merge_idx`` is the replay order — BPE merges
    are order-sensitive, so the loader sorts on it rather than trusting
    file order. One tiny file; coalesce(1) keeps the artifact atomic
    and cheap to ship to executors as a closure later."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(
        rows, "merge_idx int, a string, b string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge list written by :func:`save_bpe`, in training
    order. The table is vocab-sized (hundreds to tens of thousands of
    rows), so the driver collect is bounded by construction."""
    return [
        (r.a, r.b)
        for r in spark.read.parquet(path).orderBy("merge_idx").collect()
    ]


def bpe_segment(col: F.Column, merges: list[tuple[str, str]]) -> F.Column:
    """Segment a WORD column into learned subword symbols by replaying
    the merge list in order (Arrow-batched; the merge list rides into
    the closure — KBs for any practical vocab)."""
    merge_list = [tuple(m) for m in merges]

    def kernel(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            s = list(w) + [END_OF_WORD]
            for a, b in merge_list:
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            out.append(s)
        return pd.Series(out)

    return F.pandas_udf(kernel, "array<string>")(col)
