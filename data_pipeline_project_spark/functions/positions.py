"""Global row positions without a single-partition window.

``row_number().over(Window.orderBy(key))`` collapses the whole table
into one task (Exchange SinglePartition) — at 100x scale that window IS
the job. This module computes the identical 1-based position with only
parallel stages:

1. one tiny agg for min/max of the (numeric) order key,
2. deterministic fixed-width range buckets from pure arithmetic — no
   ``repartitionByRange`` sampling, so re-computation is stable,
3. IN ONE QUERY: per-bucket counts (map-side partial agg, <= n_buckets
   rows survive the shuffle) -> exclusive prefix-sum offsets (a window
   over the aggregated bucket rows — bounded by n_buckets, never by
   data size) broadcast-joined back onto a window partitioned BY
   BUCKET (parallel, one hash shuffle) whose row_number the offset
   shifts.

Nothing but the min/max statistic crosses the driver; the offsets stay
plan-side.

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


def parquet_key_stats(
    path: str, column: str
) -> tuple[int, int, int, int] | None:
    """Exact ``(min, max, row_count, null_count)`` of an integer column
    from parquet FOOTER statistics — a driver-side metadata read (ms),
    replacing the min/max Spark job ``with_row_position`` otherwise
    runs. Parquet min/max stats are exact for integer physical types
    (no truncation, unlike long strings). Returns None when the layout
    or stats are unavailable (caller falls back to the Spark job):
    statistics-driven planning must degrade, never guess.
    """
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        else:
            files = [path]
        if not files:
            return None
        lo, hi, n, nulls = None, None, 0, 0
        for f in files:
            md = pq.read_metadata(f)
            n += md.num_rows
            idx = md.schema.names.index(column)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max or st.null_count is None:
                    return None
                nulls += st.null_count
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is None and n > 0:
            return None
        return (lo, hi, n, nulls)
    except Exception:  # noqa: BLE001 — fall back to the Spark statistics job
        return None


def with_row_position(
    df: DataFrame,
    order_key: Column | str,
    *tiebreaks: Column | str,
    col_name: str = "row_pos",
    n_buckets: int = 65536,
    persist: bool = True,
    key_stats: tuple | None = None,
) -> DataFrame:
    """Add 1-based ``col_name`` = rank of each row under
    ``ORDER BY order_key [NULLS FIRST], *tiebreaks``.

    ``order_key`` must cast to bigint (integer keys directly; pass
    ``F.unix_micros(ts)`` for timestamps). Ties on the key are broken
    by ``tiebreaks`` — the full (key, *tiebreaks) tuple must be unique
    for the position to be well-defined.

    Scale: one tiny min/max agg job, then ONE query whose counts
    branch is a narrow pruned scan feeding a map-side partial agg
    (only <= n_buckets aggregated rows shuffle; the prefix-sum window
    over them is single-partition by construction but bounded by
    n_buckets, never by data size) and whose main branch is the hash
    shuffle on the bucket id. Driver traffic is the 1-row statistic.

    ``persist``: both the statistics job and the final query's two
    branches read the keyed frame. With ``persist=True`` (the safe
    default) it is cached so a nondeterministic upstream can't make
    the bucket counts disagree with the main window pass. Pass
    ``persist=False`` when the input is deterministic (a file scan
    plus pure projections/filters — the common case): the extra reads
    rescan only the pruned key column, which is far cheaper than
    materializing the full row width into the cache.

    ``key_stats``: optional exact ``(min, max, row_count)`` or
    ``(min, max, row_count, null_count)`` of the order key (min/max
    over non-null keys, row_count over ALL rows) — e.g. from
    ``parquet_key_stats`` footer statistics or warehouse table stats.
    Supplying it removes the only Spark job ahead of the main query.
    When a 4-tuple additionally PROVES the key dense (no nulls and
    row_count == max-min+1 — with the unique-key contract above, every
    value in [min, max] appears exactly once), the position collapses
    to the pure projection ``key - min + 1``: zero shuffles, zero
    windows, one scan — the statistics-driven plan a warehouse
    optimizer picks for a dense surrogate key. Wrong values silently
    corrupt positions, so only pass authoritative statistics.
    """
    key = F.col(order_key) if isinstance(order_key, str) else order_key

    if (
        key_stats is not None
        and len(key_stats) == 4
        and key_stats[0] is not None
        and key_stats[3] == 0
        and key_stats[2] == int(key_stats[1]) - int(key_stats[0]) + 1
    ):
        return df.withColumn(
            col_name, (key.cast("bigint") - F.lit(int(key_stats[0])) + 1).cast("long")
        )

    keyed = df.withColumn(_KEY, key.cast("bigint"))
    if persist:
        keyed = keyed.persist()

    if key_stats is None:
        row = keyed.agg(
            F.min(_KEY).alias("lo"), F.max(_KEY).alias("hi"), F.count(F.lit(1)).alias("n")
        ).first()
        key_stats = (row["lo"], row["hi"], row["n"]) if row is not None else (None, None, 0)
    lo, hi, n_rows = key_stats[0], key_stats[1], key_stats[2]
    if n_rows == 0:
        if persist:
            keyed.unpersist()
        return df.withColumn(col_name, F.lit(None).cast("long"))
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
    eff_buckets = min(n_buckets, max(sc.defaultParallelism, int(n_rows) // 1_000_000 + 1))
    width = max(1, span // eff_buckets + 1)

    bucket = F.when(F.col(_KEY).isNull(), F.lit(_NULL_BUCKET)).otherwise(
        F.expr(f"({_KEY} - {int(lo)}) div {width}")
    )
    bucketed = keyed.withColumn(_BUCKET, bucket.cast("bigint"))

    # Offsets stay plan-side: per-bucket counts collapse map-side
    # (partial agg), so only <= eff_buckets aggregated rows shuffle;
    # the exclusive prefix sum over them is a single-partition window
    # BOUNDED BY THE BUCKET COUNT (<= 65536 rows), not by data size —
    # unlike the global window this module exists to avoid. The result
    # broadcast-joins back, a hash join that stays O(1) per row where a
    # create_map of 2*eff_buckets literals would blow up codegen.
    w_off = Window.orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        bucketed.groupBy(_BUCKET)
        .agg(F.count(F.lit(1)).alias("_rp_cnt"))
        .select(
            _BUCKET,
            F.coalesce(F.sum("_rp_cnt").over(w_off), F.lit(0)).alias("_rp_off"),
        )
    )

    w = Window.partitionBy(_BUCKET).orderBy(F.col(_KEY).asc_nulls_first(), *tiebreaks)
    return (
        bucketed.join(F.broadcast(offs), _BUCKET)
        .withColumn(col_name, (F.col("_rp_off") + F.row_number().over(w)).cast("long"))
        .drop(_KEY, _BUCKET, "_rp_off")
    )
