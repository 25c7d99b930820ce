"""Compressibility quality signals (operators/text.py).

The zlib ratio is the one standard corpus-quality signal SQL cannot
express, so there is no DuckDB oracle; instead the tests pin the Spark
plan's output against a direct python-zlib reference over the same
rows, the discriminative behavior the filter exists for, and the plan
shape (Arrow-batched, not row-at-a-time)."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.text import (
    compressibility_flags,
    compression_signals,
)
from tests.conftest import SF_SMALL


def test_matches_direct_zlib_reference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(80)
    out = (
        docs.select("doc_id", "text", compression_signals(F.col("text")).alias("s"))
        .select("doc_id", "text", "s.*")
        .collect()
    )
    assert len(out) == 80
    for r in out:
        raw = (r.text or "").encode("utf-8")
        assert r.n_bytes == len(raw)
        c = len(zlib.compress(raw, 6))
        assert r.n_compressed == c
        assert r.compression_ratio == math.floor(c / len(raw) * 1e6 + 0.5) / 1e6


def test_signal_discriminates_repetition_and_noise(spark):
    import random

    import string

    rng = random.Random(7)
    # Full printable-ASCII random: ~6.6 bits/char entropy → ratio ~0.85,
    # above the hi=0.8 cut. (Hex noise is only 4 bits/char → ~0.57 —
    # zlib's Huffman stage sees that structure, which is the point of
    # using a real compressor as the signal.)
    noise = "".join(rng.choice(string.printable) for _ in range(4000))
    # Varied text: uniform draws from a 500-word vocabulary (~0.41 at
    # zlib-6 — squarely in the keep band; repeated-sentence "prose"
    # would itself land in too_repetitive, correctly).
    vocab = [f"w{i}{c}" for i, c in enumerate("abcdefghijklmnopqrstuvwxyz" * 20)][:500]
    varied = " ".join(rng.choice(vocab) for _ in range(700))
    rows = [
        (1, "spam " * 800),                      # pure repetition
        (2, varied),
        (3, noise),                              # incompressible junk
        (4, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", compressibility_flags(F.col("text")).alias("f")
        ).select("doc_id", "f.*").collect()
    }
    assert got[1].too_repetitive and not got[1].keep
    assert got[2].keep and not got[2].too_repetitive and not got[2].incompressible
    assert got[3].incompressible and not got[3].keep
    # empty doc: defined ratio 1.0 → lands in 'incompressible', never 'keep'
    assert got[4].compression_ratio == 1.0 and not got[4].keep
    # ordering sanity: repetition << prose << noise
    assert got[1].compression_ratio < got[2].compression_ratio < got[3].compression_ratio


def test_plan_is_arrow_batched_and_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = (
        docs.select("doc_id", compression_signals(F.col("text")).alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
