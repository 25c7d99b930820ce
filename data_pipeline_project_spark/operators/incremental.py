"""Incremental-ingest deduplication: new batch vs. a huge historical
corpus, without ever shuffling the historical side.

The 100 TB problem this solves: a training-data pipeline ingests a few
GB of new documents per run and must drop anything already present in
a 100 TB historical corpus. The naive ``new.join(historical, key,
"left_anti")`` plan shuffles BOTH sides on the key — re-hashing 100 TB
every run. The standard fix (what this module implements):

1. build a Bloom filter over the historical keys — one narrow scan,
   no shuffle, bitmaps OR-combined up a tree;
2. broadcast the (MB-sized) filter and split the new batch:
   bloom-negative rows are DEFINITELY new (no false negatives);
3. exactly verify only the bloom-positive candidates with one
   broadcast semi join against the historical scan — historical is
   read once, shuffled never, and only candidate keys (bounded by the
   new-batch size x fpp + true dups) cross the wire.

Result is exactly ``new LEFT ANTI JOIN historical`` — the filter only
prunes work, never changes the answer (verified property-style in
tests/test_incremental.py).

Reference scope note: the reference pipeline's dedup surface is
file-level (`pipeline.py:362-372` recently_processed set); row-level
incremental dedup is part of the LLM-data-pipeline extension surface
(BASELINE.json north star).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Second xxhash64 seed column for Kirsch-Mitzenmacher double hashing:
# position_i(x) = (h1(x) + i*h2(x)) mod m_bits gives k near-independent
# probes from two real hash evaluations.
_H2_SALT = 0x9E3779B9


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_items`` keys at target false-
    positive probability ``fpp``: m = -n ln p / (ln 2)^2, k = m/n ln 2.
    m is rounded up to a whole byte."""
    n_items = max(n_items, 1)
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _hash_cols(df: DataFrame, key_col: str) -> DataFrame:
    # Hash the STRING form of the key so semantics are type-stable
    # (xxhash64 of 1L and "1" differ; casting fixes the contract).
    key = F.col(key_col).cast("string")
    return df.withColumn("_bf_h1", F.xxhash64(key)).withColumn(
        "_bf_h2", F.xxhash64(key, F.lit(_H2_SALT))
    )


def _bitmap_builder(m_bits: int, k: int):
    """mapInPandas kernel: fold a whole partition's (h1, h2) rows into
    one local bitmap, emit a single binary row. Runs on executors; the
    per-task output is m_bits/8 bytes regardless of row count."""
    import numpy as np

    def build(batches):
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf["_bf_h1"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf["_bf_h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                                 np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        import pandas as pd

        yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    return build


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    combine_fanin: int = 64,
) -> tuple[bytes, int, int]:
    """Distributed Bloom-filter build over ``df[key_col]``.

    Returns ``(bitmap_bytes, m_bits, k_hashes)``. One narrow scan: each
    partition folds its keys into a local bitmap (mapInPandas), and
    bitmaps are OR-combined. With more than ``combine_fanin`` partition
    bitmaps an intermediate distributed OR level runs first (grouped by
    ``spark_partition_id % fanin``) so the driver never collects more
    than ``fanin`` bitmaps — the tree-reduce shape that holds at 1000
    executors. ``expected_items`` sizes the filter; when omitted a
    count() of the scan supplies it (at warehouse scale pass table
    statistics instead)."""
    import numpy as np

    if expected_items is None:
        expected_items = df.select(key_col).count()
    m_bits, k = bloom_parameters(expected_items, fpp)

    hashed = _hash_cols(df.select(key_col), key_col).select("_bf_h1", "_bf_h2")
    parts = hashed.mapInPandas(_bitmap_builder(m_bits, k), "bitmap binary")
    if parts.rdd.getNumPartitions() > combine_fanin:
        or_kernel = _bitmap_or_builder(m_bits)
        parts = (
            parts.withColumn(
                "grp", F.pmod(F.spark_partition_id(), F.lit(combine_fanin))
            )
            .repartition(combine_fanin, "grp")
            .select("bitmap")
            .mapInPandas(or_kernel, "bitmap binary")
        )
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts.collect():
        bitmap |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return bitmap.tobytes(), m_bits, k


def _bitmap_or_builder(m_bits: int):
    import numpy as np

    def orfold(batches):
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            for b in pdf["bitmap"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
        import pandas as pd

        yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    return orfold


def bloom_add(
    df: DataFrame, key_col: str, bitmap: bytes, m_bits: int, k: int
) -> bytes:
    """Fold ``df[key_col]`` into an EXISTING filter (fixed m/k) — the
    incremental-maintenance path: after appending a batch to the
    corpus, union its keys in instead of rebuilding from the full
    corpus. Bloom bitmaps are closed under OR, so this is exact. fpp
    degrades once insertions exceed the n the filter was sized for —
    rebuild via build_bloom when the corpus outgrows it."""
    import numpy as np

    hashed = _hash_cols(df.select(key_col), key_col).select("_bf_h1", "_bf_h2")
    parts = hashed.mapInPandas(_bitmap_builder(m_bits, k), "bitmap binary")
    acc = np.frombuffer(bitmap, dtype=np.uint8).copy()
    for row in parts.collect():
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return acc.tobytes()


def bloom_might_contain(spark, bitmap: bytes, m_bits: int, k: int):
    """Returns a pandas_udf ``(h1, h2) -> bool`` testing membership.
    The bitmap ships to executors once via a Spark broadcast variable,
    not per-task closure pickling."""
    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast(bitmap)

    def kernel(h1, h2):
        if len(h1) == 0:
            return pd.Series([], dtype=bool)
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        a = h1.to_numpy(dtype=np.int64).astype(np.uint64)
        b = h2.to_numpy(dtype=np.int64).astype(np.uint64)
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            byte = bm[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return pd.Series(hit)

    return F.pandas_udf(kernel, "boolean")


def _partition_distinct(key_col: str):
    """mapInPandas kernel: drop duplicate keys within a partition
    (across its Arrow batches). Duplicates surviving across partitions
    are harmless to the anti-join — this only bounds broadcast size."""

    def dedup(batches):
        seen: set = set()
        for pdf in batches:
            vals = pdf[key_col]
            keep = pdf[~vals.isin(seen) & ~vals.duplicated()]
            if len(keep):
                seen.update(keep[key_col].tolist())
                yield keep

    return dedup


def incremental_dedup(
    new_batch: DataFrame,
    historical: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    bloom: tuple[bytes, int, int] | None = None,
) -> DataFrame:
    """Rows of ``new_batch`` whose ``key_col`` does NOT appear in
    ``historical`` — semantically ``new_batch.join(historical, key,
    "left_anti")``, planned so the historical side is scanned once and
    never shuffled (see module docstring for the three-step shape).

    Assumes |new_batch| << |historical| (the incremental-ingest
    contract): bloom-positive candidate keys must fit a broadcast.

    ``bloom``: a prebuilt ``(bitmap, m_bits, k)`` covering (at least)
    the historical keys — pass it when the caller maintains the filter
    across repeated batches (streaming/corpus_ingest.py) to skip the
    per-call build scan. Extra keys in the filter only add false
    positives, which verification removes; correctness needs every
    historical key present (no-false-negative side).
    """
    spark = new_batch.sparkSession
    bitmap, m_bits, k = bloom or build_bloom(
        historical, key_col, expected_items, fpp
    )
    might = bloom_might_contain(spark, bitmap, m_bits, k)

    hashed = _hash_cols(new_batch, key_col).withColumn(
        "_bf_hit", might(F.col("_bf_h1"), F.col("_bf_h2"))
    )
    definite_new = hashed.where(~F.col("_bf_hit"))
    candidates = hashed.where(F.col("_bf_hit"))

    # Historical side: ONE scan, broadcast-semi-joined down to the keys
    # that actually collide — no exchange on the big side (asserted in
    # tests/test_incremental.py::test_plan_never_shuffles_historical).
    cand_keys = candidates.select(key_col)
    matched = historical.select(key_col).join(
        F.broadcast(cand_keys), key_col, "left_semi"
    )
    # Per-partition distinct (shuffle-free): left_semi keeps one row per
    # HISTORICAL occurrence of a matched key, so a hot key duplicated
    # millions of times would blow the broadcast. A map-side dedup
    # bounds it by distinct-keys-per-partition instead, without the
    # exchange a global distinct() would add (the zero-shuffle contract
    # on the historical side is plan-asserted).
    matched = matched.mapInPandas(_partition_distinct(key_col), matched.schema)
    survivors = candidates.join(F.broadcast(matched), key_col, "left_anti")
    return definite_new.unionByName(survivors).drop("_bf_h1", "_bf_h2", "_bf_hit")


# ---- incremental aggregate maintenance -------------------------------------
#
# The other half of the incremental-ingest story: per-group statistics
# over a 100 TB fact table must not be recomputed from scratch when a
# few GB of new rows arrive. The classic fix is a MERGEABLE STATE
# table: keep per-group (count, exact sum, min, max) — every one of
# which is an associative/commutative monoid — then each ingest
# computes the same state over ONLY the delta and merges the two state
# tables with a |groups|-sized shuffle. The raw historical rows are
# never read again.
#
# Sums are carried as DECIMAL(38,6): integer arithmetic underneath, so
# the merged sum is bit-identical to a full recompute regardless of
# how many increments (or which partitioning) produced it — the same
# exactness trick the registry's q1 uses, which is what lets
# tests/conftest.py oracle-check the merged state against DuckDB's
# one-shot GROUP BY.

_DEC = "decimal(38,6)"


def aggregate_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group mergeable state ``(rows, n, sum, min, max)`` of
    ``value_col``.

    ``n`` counts non-null values (matching SQL aggregate semantics);
    ``rows`` counts ALL rows so retraction can tell "every row deleted"
    (drop the group) apart from "every remaining value is null" (keep
    the group with n=0, like a one-shot GROUP BY would). The sum is
    decimal-exact so merge order can never change it.
    """
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_st_rows"),
        F.count(v).alias("_st_n"),
        F.sum(v.cast(_DEC)).alias("_st_sum"),
        F.min(v).alias("_st_min"),
        F.max(v).alias("_st_max"),
    )


def merge_aggregate_states(*states: DataFrame) -> DataFrame:
    """Merge state tables produced by :func:`aggregate_state` on the
    same keys: union then one more monoid fold. Shuffles only state
    rows (one per group per input), never the underlying facts."""
    keys = [c for c in states[0].columns if not c.startswith("_st_")]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.sum("_st_rows").alias("_st_rows"),
        F.sum("_st_n").alias("_st_n"),
        F.sum("_st_sum").alias("_st_sum"),
        F.min("_st_min").alias("_st_min"),
        F.max("_st_max").alias("_st_max"),
    )


def finalize_aggregate_state(state: DataFrame) -> DataFrame:
    """Render a state table as user-facing statistics. The mean comes
    from the exact decimal sum, so it is identical to a single-shot
    AVG over all rows (rounded to 6 places for cross-engine dtype
    stability)."""
    keys = [c for c in state.columns if not c.startswith("_st_")]
    return state.select(
        *keys,
        F.col("_st_n").alias("n_rows"),
        F.col("_st_sum").cast("double").alias("sum_value"),
        F.col("_st_min").alias("min_value"),
        F.col("_st_max").alias("max_value"),
        # Exact-sum double / count: one IEEE division on identical
        # inputs in any engine — avoids decimal-division scale rules
        # that differ between Spark and DuckDB. try_divide: a group
        # whose values are all null has n=0 (null sum / null avg, like
        # SQL aggregates), which must not abort under ANSI mode.
        F.round(
            F.try_divide(F.col("_st_sum").cast("double"), F.col("_st_n")), 6
        ).alias("avg_value"),
    )


def retract_aggregate_state(state: DataFrame, deleted: DataFrame) -> DataFrame:
    """Apply a DELETE batch to a state table: the CDC complement of
    :func:`merge_aggregate_states`.

    count and the decimal-exact sum are invertible monoids, so they are
    subtracted exactly. min/max are NOT invertible — instead of
    rescanning everything, groups whose deleted values touch the
    current extremes are FLAGGED (``_st_minmax_stale``) and repaired by
    :func:`repair_aggregate_state` with a scan bounded to those groups.
    Groups whose ROWS are all deleted are dropped; a group that keeps
    null-valued rows after losing every non-null value survives with
    n=0 (flagged stale — deleting all values necessarily deletes the
    min, so the existing extreme test fires and repair nulls the
    sum/min/max exactly like a one-shot GROUP BY). ``deleted`` is an
    :func:`aggregate_state` over the delete batch (bounded by the batch,
    not history).
    """
    keys = [c for c in state.columns if not c.startswith("_st_")]
    d = deleted.select(
        *keys,
        F.col("_st_rows").alias("_d_rows"),
        F.col("_st_n").alias("_d_n"),
        F.col("_st_sum").alias("_d_sum"),
        F.col("_st_min").alias("_d_min"),
        F.col("_st_max").alias("_d_max"),
    )
    j = state.join(d, keys, "left")
    adjusted = (
        j.select(
            *keys,
            (
                F.col("_st_rows") - F.coalesce(F.col("_d_rows"), F.lit(0))
            ).alias("_st_rows"),
            (F.col("_st_n") - F.coalesce(F.col("_d_n"), F.lit(0))).alias("_st_n"),
            (
                F.col("_st_sum")
                - F.coalesce(F.col("_d_sum"), F.lit(0).cast(_DEC))
            ).alias("_st_sum"),
            F.col("_st_min"),
            F.col("_st_max"),
            # coalesce(FALSE): a delete batch whose values for this
            # group are all NULL (_d_n = 0, null extremes) cannot touch
            # min/max — a null flag here would be dropped by BOTH
            # repair branches and silently lose the group.
            F.coalesce(
                F.col("_d_n").isNotNull()
                & (
                    (F.col("_d_min") <= F.col("_st_min"))
                    | (F.col("_d_max") >= F.col("_st_max"))
                ),
                F.lit(False),
            ).alias("_st_minmax_stale"),
        )
        .where(F.col("_st_rows") > 0)
    )
    return adjusted


def repair_aggregate_state(
    state: DataFrame, facts: DataFrame, value_col: str
) -> DataFrame:
    """Recompute min/max (and, for free, the whole state row) for the
    groups :func:`retract_aggregate_state` flagged stale, scanning only
    those groups' remaining facts (broadcast semi-join prune — at 100 TB
    with partition-aligned keys this is a partition-pruned scan, not a
    full pass). Clean groups pass through untouched."""
    keys = [
        c
        for c in state.columns
        if not c.startswith("_st_")
    ]
    stale_keys = state.where(F.col("_st_minmax_stale")).select(*keys)
    fresh = aggregate_state(
        facts.join(F.broadcast(stale_keys), keys, "left_semi"), keys, value_col
    )
    clean = state.where(~F.col("_st_minmax_stale")).drop("_st_minmax_stale")
    return clean.unionByName(fresh)


# ---- multi-column aggregate state (suffixed per value column) --------
#
# The single-column functions above stay the canonical, oracle-checked
# primitives; these generalize the same monoid/retract/repair algebra
# to several value columns in ONE groupBy (state columns suffixed
# "__<col>", one shared _st_rows). sinks/matview.py is the consumer.


def _mc(name: str, col: str) -> str:
    return f"{name}__{col}"


def aggregate_state_multi(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Per-group mergeable state over several value columns in one
    hash aggregate: shared ``_st_rows`` plus per-column
    ``_st_n__c / _st_sum__c / _st_min__c / _st_max__c`` with the same
    semantics as :func:`aggregate_state`."""
    aggs = [F.count(F.lit(1)).alias("_st_rows")]
    for c in value_cols:
        v = F.col(c)
        aggs += [
            F.count(v).alias(_mc("_st_n", c)),
            F.sum(v.cast(_DEC)).alias(_mc("_st_sum", c)),
            F.min(v).alias(_mc("_st_min", c)),
            F.max(v).alias(_mc("_st_max", c)),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states_multi(
    value_cols: list[str], *states: DataFrame
) -> DataFrame:
    keys = [c for c in states[0].columns if not c.startswith("_st_")]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum("_st_rows").alias("_st_rows")]
    for c in value_cols:
        aggs += [
            F.sum(_mc("_st_n", c)).alias(_mc("_st_n", c)),
            F.sum(_mc("_st_sum", c)).alias(_mc("_st_sum", c)),
            F.min(_mc("_st_min", c)).alias(_mc("_st_min", c)),
            F.max(_mc("_st_max", c)).alias(_mc("_st_max", c)),
        ]
    return merged.groupBy(*keys).agg(*aggs)


def retract_aggregate_state_multi(
    value_cols: list[str], state: DataFrame, deleted: DataFrame
) -> DataFrame:
    """Multi-column retract: counts and decimal sums subtract exactly
    per column; ONE combined ``_st_minmax_stale`` flag fires if ANY
    column's deleted values touch its current extremes (repair
    recomputes the whole group row anyway, so per-column flags would
    buy nothing)."""
    keys = [c for c in state.columns if not c.startswith("_st_")]
    sel = [*keys, F.col("_st_rows").alias("_d_rows")]
    for c in value_cols:
        sel += [
            F.col(_mc("_st_n", c)).alias(_mc("_d_n", c)),
            F.col(_mc("_st_sum", c)).alias(_mc("_d_sum", c)),
            F.col(_mc("_st_min", c)).alias(_mc("_d_min", c)),
            F.col(_mc("_st_max", c)).alias(_mc("_d_max", c)),
        ]
    j = state.join(deleted.select(*sel), keys, "left")
    out = [
        *keys,
        (F.col("_st_rows") - F.coalesce(F.col("_d_rows"), F.lit(0))).alias(
            "_st_rows"
        ),
    ]
    stale = F.lit(False)
    for c in value_cols:
        out += [
            (
                F.col(_mc("_st_n", c))
                - F.coalesce(F.col(_mc("_d_n", c)), F.lit(0))
            ).alias(_mc("_st_n", c)),
            (
                F.col(_mc("_st_sum", c))
                - F.coalesce(F.col(_mc("_d_sum", c)), F.lit(0).cast(_DEC))
            ).alias(_mc("_st_sum", c)),
            F.col(_mc("_st_min", c)),
            F.col(_mc("_st_max", c)),
        ]
        stale = stale | F.coalesce(
            F.col(_mc("_d_n", c)).isNotNull()
            & (
                (F.col(_mc("_d_min", c)) <= F.col(_mc("_st_min", c)))
                | (F.col(_mc("_d_max", c)) >= F.col(_mc("_st_max", c)))
            ),
            F.lit(False),
        )
    return (
        j.select(*out, stale.alias("_st_minmax_stale"))
        .where(F.col("_st_rows") > 0)
    )


def repair_aggregate_state_multi(
    value_cols: list[str], state: DataFrame, facts: DataFrame
) -> DataFrame:
    keys = [c for c in state.columns if not c.startswith("_st_")]
    stale_keys = state.where(F.col("_st_minmax_stale")).select(*keys)
    fresh = aggregate_state_multi(
        facts.join(F.broadcast(stale_keys), keys, "left_semi"), keys, value_cols
    )
    clean = state.where(~F.col("_st_minmax_stale")).drop("_st_minmax_stale")
    return clean.unionByName(fresh)


def finalize_aggregate_state_multi(
    value_cols: list[str], state: DataFrame
) -> DataFrame:
    """Render multi-column state as user-facing statistics. A
    single-column view keeps the classic unsuffixed names (n_rows,
    sum_value, ...); several columns get ``__<col>`` suffixes."""
    keys = [c for c in state.columns if not c.startswith("_st_")]
    cols = list(keys)
    for c in value_cols:
        sfx = "" if len(value_cols) == 1 else f"__{c}"
        cols += [
            F.col(_mc("_st_n", c)).alias(f"n_rows{sfx}"),
            F.col(_mc("_st_sum", c)).cast("double").alias(f"sum_value{sfx}"),
            F.col(_mc("_st_min", c)).alias(f"min_value{sfx}"),
            F.col(_mc("_st_max", c)).alias(f"max_value{sfx}"),
            F.round(
                F.try_divide(
                    F.col(_mc("_st_sum", c)).cast("double"),
                    F.col(_mc("_st_n", c)),
                ),
                6,
            ).alias(f"avg_value{sfx}"),
        ]
    return state.select(*cols)
