"""Skew mitigation utilities for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these are the explicit forms for the two shapes AQE cannot
rewrite on its own:

- salted two-phase aggregation: a handful of hot group keys would
  otherwise serialize one reducer; salt spreads each key over N
  subtasks, then a second (tiny) aggregation merges the partials;
- salted broadcast-side replication join: a skewed fact key joined to
  a dim — explode the dim row N ways, salt the fact side, so the hot
  key's rows spread over N tasks while the join stays exact.

Salts are DETERMINISTIC (xxhash64 over the row, never F.rand): a salt
that feeds a shuffle key must recompute identically when Spark
re-executes a map stage after a fetch failure, or recomputed rows land
on different reducers than the attempt already-fetched outputs came
from — rows duplicated or lost (the known nondeterministic-repartition
correctness class).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from the full row content —
    stable under stage re-execution, spreads hot keys (rows share the
    key, not the payload)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).cast("int")


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase sum/count over possibly-skewed group keys.

    Phase 1 groups on (keys + random salt) — each hot key becomes
    n_salts independent partial aggregates on different tasks; phase 2
    merges partials on the keys alone. Only decomposable aggregates
    (sum/count/min/max) are offered; avg must be derived as sum/count
    by the caller. Result is exactly the unsalted aggregation (sums are
    reassociated — use decimal/int columns where bit-exactness matters).
    """
    supported = {"sum", "count", "min", "max"}
    bad = {op for op in agg_cols.values() if op not in supported}
    if bad:
        raise ValueError(f"non-decomposable aggs {bad}; supported: {supported}")

    phase1 = (
        df.withColumn(SALT_COL, _row_salt(df, n_salts))
        .groupBy(*group_cols, SALT_COL)
        .agg(
            *[
                getattr(F, op)(c).alias(f"{c}_{op}")
                for c, op in agg_cols.items()
            ]
        )
    )
    merge = {
        "sum": F.sum,
        "count": F.sum,  # counts merge by summing partial counts
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*group_cols).agg(
        *[
            merge[op](f"{c}_{op}").alias(f"{c}_{op}")
            for c, op in agg_cols.items()
        ]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact table to a small dim with the dim replicated
    n_salts ways. Each fact row derives a deterministic salt from its
    content; the dim carries every salt value, so the join key
    (key, salt) spreads any hot key over n_salts tasks. Exact same
    rows as the unsalted join, stable under stage retry."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    dim_rep = dim.withColumn(SALT_COL, salts)
    fact_s = fact.withColumn(SALT_COL, _row_salt(fact, n_salts))
    out = fact_s.join(F.broadcast(dim_rep), [key, SALT_COL], how)
    return out.drop(SALT_COL)
