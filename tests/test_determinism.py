"""Determinism under parallelism: registry results must not depend on
the physical shuffle layout.

On a 1000-executor cluster the number of shuffle partitions, AQE
coalescing decisions, and partial-aggregation merge order all differ
from the test box — and from run to run. A query whose VALUES change
with the layout (float partial-agg order, first()-without-order,
hash-partition-dependent sampling) would pass the oracle gate here and
silently drift in production. The repo's design answer is
order-independent arithmetic (decimal money sums, int64 microlog
fixed-point for logprobs, hash-derived rather than positional
sampling); this suite verifies that claim mechanically: run each
representative query twice — once under the session's normal layout
(8 shuffle partitions, AQE coalescing on) and once under a hostile one
(13 partitions, coalescing OFF so the shuffle really fans out even at
test SF) — and require the canonicalized results to be BYTE-IDENTICAL,
floats included. No tolerance: a last-bit float drift is exactly the
failure mode the driver's value hash would trip on.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_pipeline_project_spark.plans.registry import get_queries
from tests.conftest import SF_SMALL

# One representative per tier, biased toward plans with real shuffle
# structure (iterative CC, banded joins, window sorts, float outputs).
QUERIES = [
    "q1_pricing_summary",          # decimal money sums
    "sensor_stats_long",           # unpivot + avg/stddev
    "tfidf_top_terms",             # double tf-idf + window top-k
    "dedup_minhash_lsh",           # banded bucket join
    "dedup_clusters",              # iterative pointer jumping
    "stats_catalog_parity",        # log-derived stats vs recompute (r11 swap-in)
    "era_mixed_time_range",        # partition-evolution pruned reads (r12 swap-in)
    "sessionization",              # lag + cumulative windows
    "table_checksum_digest",       # order-independent digest sums
    "token_count_bpe",             # regex tokenization + aggs
    "similarity_topk_bruteforce",  # vector fold + top-k window
    "incremental_agg_merge",       # partial-state merge
    "watermark_late_events",       # bucketed two-phase prefix-max
    "ewma_smoothing",              # order-sensitive recursion on sorted frames
]

# Deregistered (EXTRA_ORACLE_QUERIES) plans whose float outputs lean on
# the round-to-6dp guard — resolved from the plans modules directly.
DEREG_QUERIES = [
    ("relational_queries", "stat_correlations"),  # corr/covar/regr moments
    ("relational_queries", "feature_zscore"),     # rounded mu/sigma ratio
    # r11 registry swap-out — still determinism-pinned here
    ("llmops_queries", "train_val_test_split"),   # hash-derived split
]

PERTURBED = {
    "spark.sql.shuffle.partitions": "13",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _canon_str(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # repr preserves full float precision → byte-identical means
    # bit-identical for doubles.
    df = df.map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture()
def perturbed_layout(spark):
    saved = {k: spark.conf.get(k) for k in PERTURBED}
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _check_invariant(spark, q, name):
    base = q(spark, SF_SMALL).toPandas()
    for k, v in PERTURBED.items():
        spark.conf.set(k, v)
    alt = q(spark, SF_SMALL).toPandas()

    b, a = _canon_str(base), _canon_str(alt)
    assert list(b.columns) == list(a.columns)
    assert len(b) == len(a), f"{name}: row count changed {len(b)} -> {len(a)} under perturbed layout"
    neq = (b != a).any(axis=1)
    if neq.any():
        i = neq.idxmax()
        raise AssertionError(
            f"{name}: values depend on shuffle layout at canon row {i}: "
            f"base={b.iloc[i].to_dict()} alt={a.iloc[i].to_dict()}"
        )


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_layout(spark, perturbed_layout, name):
    _check_invariant(spark, get_queries()[name], name)


@pytest.mark.parametrize("mod,name", DEREG_QUERIES)
def test_deregistered_invariant_to_shuffle_layout(spark, perturbed_layout, mod, name):
    import importlib

    m = importlib.import_module(f"data_pipeline_project_spark.plans.{mod}")
    _check_invariant(spark, getattr(m, name), name)
