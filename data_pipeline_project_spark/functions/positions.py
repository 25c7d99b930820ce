"""Global row positions without a single-partition window.

``row_number().over(Window.orderBy(key))`` collapses the whole table
into one task (Exchange SinglePartition) — at 100x scale that window IS
the job. This module computes the identical 1-based position with only
parallel stages:

1. one tiny agg for min/max of the (numeric) order key,
2. deterministic fixed-width range buckets from pure arithmetic — no
   ``repartitionByRange`` sampling, so re-computation is stable,
3. per-bucket counts collected to the driver (<= n_buckets rows) and
   turned into exclusive prefix-sum offsets,
4. a window partitioned BY BUCKET (parallel, one hash shuffle) whose
   row_number is shifted by the bucket offset.

The result is bit-identical to the global window for a unique order
key, and to the nulls-first Spark ordering when the key has nulls
(nulls land in a dedicated bucket before all others).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KEY = "_rp_key"
_BUCKET = "_rp_bucket"
_NULL_BUCKET = -1


def with_row_position(
    df: DataFrame,
    order_key: Column | str,
    *tiebreaks: Column | str,
    col_name: str = "row_pos",
    n_buckets: int = 1024,
) -> DataFrame:
    """Add 1-based ``col_name`` = rank of each row under
    ``ORDER BY order_key [NULLS FIRST], *tiebreaks``.

    ``order_key`` must cast to bigint (integer keys directly; pass
    ``F.unix_micros(ts)`` for timestamps). Ties on the key are broken
    by ``tiebreaks`` — the full (key, *tiebreaks) tuple must be unique
    for the position to be well-defined.

    Scale: two narrow scans (min/max, per-bucket counts) + one hash
    shuffle on the bucket id; driver traffic is <= n_buckets rows. The
    keyed input stays persisted (the returned plan reads it); Spark's
    LRU eviction reclaims it — callers that loop may ``unpersist()``
    via ``df.sparkSession.catalog.clearCache()`` between iterations.
    """
    key = F.col(order_key) if isinstance(order_key, str) else order_key
    # Persist: three jobs (min/max, per-bucket counts, final window) read
    # this frame; without it the upstream recomputes per job, and a
    # nondeterministic upstream could make the collected counts disagree
    # with the final window pass, corrupting offsets.
    keyed = df.withColumn(_KEY, key.cast("bigint")).persist()

    stats = keyed.agg(
        F.min(_KEY).alias("lo"), F.max(_KEY).alias("hi"), F.count(F.lit(1)).alias("n")
    ).first()
    if stats is None or stats["n"] == 0:
        keyed.unpersist()
        return df.withColumn(col_name, F.lit(None).cast("long"))
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:  # all keys null
        lo = hi = 0
    span = int(hi) - int(lo)
    if span >= 2**63:  # Spark-side (key - lo) would overflow bigint:
        # silently wrong buckets with ANSI off, runtime error with ANSI on.
        raise ValueError(
            f"order-key range {span} exceeds int64; rescale the key (e.g. "
            "unix_micros -> unix_seconds) before calling with_row_position"
        )
    width = max(1, span // n_buckets + 1)

    bucket = F.when(F.col(_KEY).isNull(), F.lit(_NULL_BUCKET)).otherwise(
        F.expr(f"({_KEY} - {int(lo)}) div {width}")
    )
    bucketed = keyed.withColumn(_BUCKET, bucket)

    counts = sorted(
        (r[_BUCKET], r["cnt"])
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: list[Column] = []
    acc = 0
    for b, cnt in counts:
        offsets.extend((F.lit(b), F.lit(acc)))
        acc += cnt
    offset_map = F.create_map(*offsets)

    w = Window.partitionBy(_BUCKET).orderBy(F.col(_KEY).asc_nulls_first(), *tiebreaks)
    return (
        bucketed.withColumn(
            col_name,
            (F.element_at(offset_map, F.col(_BUCKET)) + F.row_number().over(w)).cast("long"),
        )
        .drop(_KEY, _BUCKET)
    )
