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


# ---- count-min sketch ------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def count_min_table(
    items: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build a Count-Min sketch as a (d, bucket, counter) DataFrame:
    ``depth`` salted md5 bucket hashes per item, one hash-aggregate.

    Scale shape: each input row expands to ``depth`` (d, bucket) pairs,
    but map-side partial aggregation collapses every partition's
    contribution to at most depth x width counter rows before the
    shuffle — the exchange moves sketch-sized state, never the stream.
    The result is depth x width rows total (a few KB), broadcastable to
    any consumer. Mergeable by construction: sketches of two streams
    ADD counter-wise (they share the deterministic hash family), which
    is the property that lets per-day / per-source sketches roll up
    without rescanning.

    The md5 bucket family makes the sketch BIT-REPRODUCIBLE across
    engines (same construction as operators/text.token_hash), so even
    the approximate estimates hash-check against a SQL oracle — rare
    for a sketch, and exactly what you want when two systems must agree
    on the same approximation.
    """
    pairs = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"cms{d}:"),
                                            F.col(col).cast("string"),
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("counter")
    )


def count_min_estimates(
    items: DataFrame,
    queries: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-frequency estimates from the Count-Min table: for each
    query item, min over the ``depth`` rows of its bucket counters.
    Overcount-only (est >= true count, always); overshoot bounded by
    colliding mass ~ N/width per row, so min-of-depth is within
    e*N/width with probability 1 - e^-depth. The sketch table is tiny
    and broadcast; query items never shuffle."""
    sketch = count_min_table(items, col, width, depth)
    q = queries.select(F.col(col).alias("item")).distinct()
    probes = q.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"cms{d}:"),
                                            F.col("item").cast("string"),
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select("item", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("item")
        .agg(F.min("counter").alias("cms_estimate"))
    )
