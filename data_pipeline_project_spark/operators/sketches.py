"""Frequency sketches: Misra-Gries heavy hitters with exact recount.

The 100 TB problem: "which values occur in more than 1/k of all rows"
(hot keys, dominant domains, over-represented boilerplate strings)
normally costs a full groupBy shuffle of the column. The
sketch-then-verify plan here never shuffles the raw data:

1. **sketch pass** — each partition runs a k-counter Misra-Gries
   summary (mapInPandas, one narrow scan). MG guarantees every item
   with partition frequency > n_p/k survives; unioning the per-
   partition survivor sets therefore contains every GLOBAL item with
   frequency > n/k (an item above the global threshold is above the
   per-partition threshold in at least one partition — pigeonhole).
   Output per partition is at most k tiny (item, weight) rows.
2. **verify pass** — the candidate set (≤ k x partitions, typically
   just k-ish) broadcasts back and the exact counts of ONLY those
   items are computed; map-side partial aggregation collapses each
   partition's contribution to ≤ |candidates| rows, so the one shuffle
   moves (item, partial_count) pairs, never raw rows.

Result: exact counts for a provable superset of the true heavy
hitters — no approximation in the answer, the sketch only prunes.

(`approx_count_distinct`/HLL and `approx_percentile`/KLL are Spark
built-ins and used elsewhere; MG is the missing member of the
mergeable-summary family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_kernel(col: str, k: int):
    """Per-partition Misra-Gries in mergeable-summary form (Agarwal et
    al., "Mergeable Summaries"): per Arrow batch, add exact value
    counts into the counter dict, then if more than k counters remain
    subtract the (k+1)-th largest count from all and keep positives.
    Guarantee: counter(x) >= freq(x) - n_p/(k+1), so any x with
    partition frequency above n_p/(k+1) survives. Vectorized counting
    (value_counts) + O(k log k) reduction per batch — no per-row
    Python."""
    import pandas as pd

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                thr = sorted(counters.values(), reverse=True)[k]
                counters = {x: c - thr for x, c in counters.items() if c > thr}
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    return sketch


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Items of ``df[col]`` that MAY exceed frequency n/k, with their
    EXACT counts — guaranteed to include every item that does exceed
    it (see module docstring for the two-pass plan). Returns
    (item, count) with ``item`` typed as the input column."""
    item_type = df.schema[col].dataType.simpleString()
    candidates = (
        df.select(F.col(col).alias(col))
        .mapInPandas(_mg_kernel(col, k), f"item {item_type}, weight long")
        .select("item")
        .distinct()
    )
    exact = (
        df.join(F.broadcast(candidates), df[col] == candidates.item, "inner")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return exact
