"""Sliding context windows over documents — the long-context training
shard expander (a document longer than the model context becomes
overlapping windows; overlap preserves cross-boundary continuity).

Two implementations with IDENTICAL semantics, pinned equal by
tests/test_context_windows.py:

- :func:`sliding_token_windows` — the PRODUCTION path: tokens ->
  ``sequence`` of window starts -> ``transform``+``slice`` ->
  ``posexplode``, all JVM-side inside whole-stage codegen. At 100 TB
  this is the only acceptable shape: no Python boundary, output rows ~
  corpus tokens / step, pipelined with no shuffle.
- :class:`ExpandWindows` — the same operator as a Python UDTF (Spark
  4's arrow-batched user-defined TABLE function, the lateral-join
  surface). Exists to cover the engine surface and as the escape hatch
  for window rules a SQL expression can't state (e.g. sentence-aware
  boundaries); its docstring is the warning label: row-at-a-time
  Python, ~10-100x slower than the builtin path.

Window rule (both paths): token windows of ``size`` starting every
``size - overlap`` tokens; every start < n_tokens emits a window, so
the tail window may be short; zero tokens -> zero windows.

No reference counterpart (the reference has no text corpus surface);
this extends the LLM-pipeline tier like operators/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.text import tokens


def sliding_token_windows(
    docs: DataFrame,
    size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, window_no, window_text, n_tokens) — JVM-side sliding
    windows. One generate per document, no shuffle; the window list is
    built lazily per row (sequence + slice), never materialized
    driver-side."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    toks = tokens(F.col(text_col))
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(step)),
    ).otherwise(F.array())
    windows = F.transform(starts, lambda s: F.slice(toks, s + 1, size))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(windows).alias("window_no", "w"),
        )
        .select(
            "doc_id",
            "window_no",
            F.array_join(F.col("w"), " ").alias("window_text"),
            F.size(F.col("w")).cast("int").alias("n_tokens"),
        )
    )


def make_expand_windows_udtf(size: int = 64, overlap: int = 16):
    """Build the UDTF class for the given window geometry. Returned
    object is registrable (``spark.udtf.register``) and callable in a
    LATERAL JOIN; tokenization mirrors operators/text.tokens (lowercase
    alnum runs) so the two paths agree byte-for-byte."""
    import re

    from pyspark.sql.functions import udtf

    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    tok_re = re.compile(r"[a-z0-9]+")

    @udtf(returnType="window_no int, window_text string, n_tokens int")
    class ExpandWindows:
        def eval(self, text: str):
            if text is None:
                return
            toks = tok_re.findall(text.lower())
            for i, start in enumerate(range(0, len(toks), step)):
                w = toks[start : start + size]
                yield i, " ".join(w), len(w)

    return ExpandWindows
