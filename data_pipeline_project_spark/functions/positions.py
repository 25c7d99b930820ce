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
    n_buckets: int = 65536,
    persist: bool = True,
) -> DataFrame:
    """Add 1-based ``col_name`` = rank of each row under
    ``ORDER BY order_key [NULLS FIRST], *tiebreaks``.

    ``order_key`` must cast to bigint (integer keys directly; pass
    ``F.unix_micros(ts)`` for timestamps). Ties on the key are broken
    by ``tiebreaks`` — the full (key, *tiebreaks) tuple must be unique
    for the position to be well-defined.

    Scale: two narrow scans (min/max, per-bucket counts) + one hash
    shuffle on the bucket id; driver traffic is <= n_buckets rows.

    ``persist``: three jobs (min/max, per-bucket counts, final window)
    read the keyed frame. With ``persist=True`` (the safe default) it
    is cached so a nondeterministic upstream can't make the collected
    counts disagree with the final window pass. Pass ``persist=False``
    when the input is deterministic (a file scan plus pure
    projections/filters — the common case): the two statistics jobs
    then rescan only the pruned key column, which is far cheaper than
    materializing the full row width into the cache.
    """
    key = F.col(order_key) if isinstance(order_key, str) else order_key
    keyed = df.withColumn(_KEY, key.cast("bigint"))
    if persist:
        keyed = keyed.persist()

    stats = keyed.agg(
        F.min(_KEY).alias("lo"), F.max(_KEY).alias("hi"), F.count(F.lit(1)).alias("n")
    ).first()
    if stats is None or stats["n"] == 0:
        if persist:
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
    # Auto-size: ~1M rows per bucket keeps each per-bucket window sort
    # in-memory, floored at the cluster's parallelism so small inputs
    # still use every core, capped at n_buckets to bound driver traffic.
    sc = df.sparkSession.sparkContext
    eff_buckets = min(n_buckets, max(sc.defaultParallelism, int(stats["n"]) // 1_000_000 + 1))
    width = max(1, span // eff_buckets + 1)

    bucket = F.when(F.col(_KEY).isNull(), F.lit(_NULL_BUCKET)).otherwise(
        F.expr(f"({_KEY} - {int(lo)}) div {width}")
    )
    bucketed = keyed.withColumn(_BUCKET, bucket)

    counts = sorted(
        (r[_BUCKET], r["cnt"])
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets = []
    acc = 0
    for b, cnt in counts:
        offsets.append((int(b), acc))
        acc += cnt
    # Broadcast-joined offset table, not a literal create_map: a map of
    # 2*eff_buckets literal expressions blows up codegen at high bucket
    # counts, while a broadcast hash join stays O(1) per row.
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_BUCKET} bigint, _rp_off bigint"
    )

    w = Window.partitionBy(_BUCKET).orderBy(F.col(_KEY).asc_nulls_first(), *tiebreaks)
    return (
        bucketed.withColumn(_BUCKET, F.col(_BUCKET).cast("bigint"))
        .join(F.broadcast(off_df), _BUCKET)
        .withColumn(col_name, (F.col("_rp_off") + F.row_number().over(w)).cast("long"))
        .drop(_KEY, _BUCKET, "_rp_off")
    )
