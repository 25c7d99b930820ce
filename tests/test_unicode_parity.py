"""Unicode-robustness of the text tier's dual implementations.

The text stats exist twice by design: JVM expression forms
(operators/text.py — what the DuckDB oracles re-derive) and the Arrow
kernel (text_stats_struct — what the registry runs). Casing tables
differ BY UNICODE VERSION across the three engines involved: a
full-BMP sweep this round found Spark 4's lower() (ICU, Unicode 16)
disagreeing with Python 3.11's str.lower() (Unicode 14) on five
codepoints (U+1C89, U+A7CB/CC/DA/DC — casings added after Unicode 14),
and DuckDB's utf8proc disagreeing with both on final sigma ('ΑΣ' →
'ασ', not 'ας') and on İ (drops the combining dot).

What makes the repo immune: tokenization is ASCII-ANCHORED —
``[^a-z0-9]+`` splits AFTER lowering, so a codepoint only influences
token-derived stats if some engine lowers it INTO [a-z0-9]. No
divergent codepoint does (verified by the sweep: all five map to
non-ASCII letters on the side that knows them; final sigma variants
are both non-ASCII). These tests pin that invariant where it matters:
kernel output == expression output on a hostile unicode battery, so a
future kernel or Spark upgrade that breaks the anchoring fails here
rather than in a driver hash at a SF whose text finally contains
exotic unicode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.text import (
    detected_lang,
    distinct_token_count,
    fingerprint,
    quality_score,
    text_stats_struct,
    token_count,
)

DIVERGENT_CASINGS = "ᲉꟋꟌꟚꟜ"

BATTERY = [
    "ΑΣ the ΑΣ",                      # final sigma (context-sensitive casing)
    "İstanbul is the city",           # İ → i + combining dot (length changes!)
    "ẞß STRASSE and the file",        # sharp s + ﬁ ligature
    "ǅungla ǄUNGLA the",              # titlecase digraph
    "K elvin K the",             # Kelvin sign lowers to ascii k BOTH sides
    f"edge {DIVERGENT_CASINGS} cases the",  # unicode-version skew codepoints
    "ᏣᎳᎩ cherokee the syllabary",     # Cherokee (lowercase added Unicode 8)
    "مرحبا بالعالم the rtl text",      # RTL Arabic
    "日本語のテキスト the cjk",         # CJK
    "éclair café the mix",  # combining accent vs precomposed
    "emoji 🤖🚀 the payload 42",
    "",                               # empty
    "the plain ascii document 123",
]


def _expression_form(df):
    t = F.col("text")
    return df.select(
        "i",
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        quality_score(t).alias("quality"),
        detected_lang(t).alias("detected_lang"),
        fingerprint(t).alias("doc_fingerprint"),
    )


def _kernel_form(df):
    return df.select("i", text_stats_struct(F.col("text")).alias("s")).select(
        "i", "s.n_tokens", "s.n_distinct_tokens", "s.quality",
        "s.detected_lang", "s.doc_fingerprint",
    )


def test_kernel_matches_expressions_on_unicode_battery(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BATTERY)], "i int, text string"
    )
    expr = {r.i: tuple(r)[1:] for r in _expression_form(df).collect()}
    kern = {r.i: tuple(r)[1:] for r in _kernel_form(df).collect()}
    for i, t in enumerate(BATTERY):
        assert expr[i] == kern[i], (
            f"kernel/expression divergence on {t!r}: {expr[i]} != {kern[i]}"
        )


def test_tokens_stay_ascii_anchored(spark):
    """The invariant that makes unicode-version skew harmless: every
    token either side produces is pure [a-z0-9] — exotic casings can
    shuffle non-ASCII letters but never mint or destroy a token
    character."""
    from data_pipeline_project_spark.operators.text import tokens

    df = spark.createDataFrame([(t,) for t in BATTERY if t], "text string")
    toks = df.select(F.explode(tokens(F.col("text"))).alias("tok")).collect()
    assert toks, "battery produced no tokens at all"
    import re

    for r in toks:
        assert re.fullmatch(r"[a-z0-9]+", r.tok), f"non-ASCII token leaked: {r.tok!r}"


@pytest.mark.parametrize("cp", [0x1C89, 0xA7CB, 0xA7CC, 0xA7DA, 0xA7DC])
def test_unicode_skew_codepoints_do_not_reach_tokens(spark, cp):
    """The five known Spark-vs-Python lower() divergences (Unicode 16
    casings absent from Python 3.11's tables): whatever each engine
    lowers them to, both sides must agree on every token-derived
    stat."""
    text = f"alpha {chr(cp)} beta {chr(cp)}x42 the"
    df = spark.createDataFrame([(0, text)], "i int, text string")
    e = _expression_form(df).collect()[0]
    k = _kernel_form(df).collect()[0]
    assert tuple(e)[1:] == tuple(k)[1:]
