"""Anti-entropy reconciliation: find WHICH rows differ between two
copies of a table without shuffling either one wholesale.

The digest query (plans/relational_queries.table_checksum_digest) is
level 0: 64 order-independent bucket digests per copy. This module is
the descent: compare digests, and only for MISMATCHED buckets descend
— re-digest the bucket's rows under a deeper modulus, repeat, and at
the bottom exchange the actual row hashes of the few leaf buckets
still differing. Matching subtrees are never re-read after their
level's digest, so the data volume compared shrinks geometrically
with each level (the Merkle-tree/anti-entropy protocol of Dynamo-style
replication, expressed as DataFrame aggregations).

At 100 TB: each level is one aggregation over the rows of the
still-suspect buckets only; with fanout f and d differing rows, the
total work is O(table/f * levels) for level 1 plus O(d * f * levels)
below — against O(table) shuffle for a full exceptAll compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(cols: list[str]) -> Column:
    """Order-independent content hash of a row's named columns — the
    engine-wide md5-prefix mechanism (cross-engine reproducible).
    Cast every column to string explicitly upstream if it carries
    floats needing fixed-point canonicalization."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")


def _digest(df: DataFrame, prefix_mod: int, mod: int):
    """Per (prefix-bucket path) digests at this level's modulus."""
    return (
        df.groupBy((F.col("_rh") % mod).alias("_bucket"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_rh").cast("decimal(38,0)")).alias("_digest"),
        )
    )


def reconcile_tables(
    left: DataFrame,
    right: DataFrame,
    cols: list[str],
    fanout: int = 64,
    max_levels: int = 3,
) -> DataFrame:
    """Rows present in one copy and not the other (by content), found
    by digest descent. Returns (side, *cols) where side is 'left_only'
    / 'right_only'. Duplicate-row multiplicity differences surface too
    (the digests count rows, not distinct rows).

    Levels: at level k the bucket key is ``row_hash % fanout^(k+1)`` —
    a finer partition REFINING the coarser one, so a clean coarse
    bucket proves all its fine buckets clean and both sides prune it
    immediately. After ``max_levels`` the surviving suspect rows (a
    geometrically small set unless the tables are wholly different)
    compare exactly as (content, multiplicity) pairs — so a row
    present twice on one side and once on the other surfaces with
    ``delta`` 1, which a plain anti join would miss."""
    l = left.select(*cols, row_hash(cols).alias("_rh"))
    r = right.select(*cols, row_hash(cols).alias("_rh"))

    mod = 1
    for _level in range(max_levels):
        mod *= fanout
        dl = _digest(l, 1, mod)
        dr = _digest(r, 1, mod)
        # buckets whose (count, digest) disagree — or exist on one side
        bad = (
            dl.alias("a")
            .join(dr.alias("b"), "_bucket", "full_outer")
            .where(
                ~(
                    F.col("a._n").eqNullSafe(F.col("b._n"))
                    & F.col("a._digest").eqNullSafe(F.col("b._digest"))
                )
            )
            .select("_bucket")
        )
        # prune both sides to suspect buckets (broadcast: bucket list is
        # bounded by the number of DIFFERING subtrees, not table size)
        l = l.join(
            F.broadcast(bad),
            (F.col("_rh") % mod) == F.col("_bucket"),
            "left_semi",
        )
        r = r.join(
            F.broadcast(bad),
            (F.col("_rh") % mod) == F.col("_bucket"),
            "left_semi",
        )

    lc = l.groupBy("_rh", *cols).agg(F.count(F.lit(1)).alias("_nl"))
    rc = r.groupBy("_rh", *cols).agg(F.count(F.lit(1)).alias("_nr"))
    joined = lc.join(rc, ["_rh", *cols], "full_outer").select(
        *cols,
        F.coalesce("_nl", F.lit(0)).alias("_nl"),
        F.coalesce("_nr", F.lit(0)).alias("_nr"),
    )
    return joined.where(F.col("_nl") != F.col("_nr")).select(
        F.when(F.col("_nl") > F.col("_nr"), "left_only")
        .otherwise("right_only")
        .alias("side"),
        F.abs(F.col("_nl") - F.col("_nr")).alias("delta"),
        *cols,
    )
