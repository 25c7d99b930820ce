"""Streaming quantiles: a mergeable fixed-bin histogram maintained in
the engine's state store — the streaming twin of the batch
approx_percentile contract (approx_quantile_accuracy pins that one).

A histogram over a DECLARED value range is the simplest mergeable
quantile summary: adding a batch is a vectorized bincount, merging is
element-wise addition, state is exactly ``n_bins`` longs per key
forever, and the quantile estimate interpolates inside the bin that
crosses the target rank — error bounded by the bin width, a knob the
caller sets against their monitoring tolerance (GK/KLL buy adaptive
precision at far more implementation surface; a monitor with a known
metric range — sensor bounds, latency budgets — doesn't need it).
Values outside [lo, hi) clamp into the edge bins, so the estimate
degrades to the declared range's edge instead of silently dropping
data.

Per-key state via applyInPandasWithState (RocksDB-backed on a
cluster); update-mode emission — the latest row per key is the live
percentile dashboard.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_quantiles(
    values: DataFrame,
    key_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    quantiles: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """``values`` is a streaming frame; returns the update-mode stream
    of (key, n, q50, q95, q99) — one column per requested quantile,
    named q{int(100*q)}."""
    qcols = [f"q{int(100 * q)}" for q in quantiles]
    out_schema = (
        f"{key_col} long, n long, "
        + ", ".join(f"{c} double" for c in qcols)
    )
    state_schema = "counts array<long>"
    width = (hi - lo) / n_bins

    def estimate(counts: np.ndarray):
        n = int(counts.sum())
        if n == 0:
            return n, [None] * len(quantiles)
        cum = np.cumsum(counts)
        out = []
        for q in quantiles:
            target = q * n
            b = int(np.searchsorted(cum, target))
            b = min(b, n_bins - 1)
            prev = cum[b - 1] if b > 0 else 0
            inbin = counts[b]
            frac = (target - prev) / inbin if inbin > 0 else 0.0
            out.append(round(lo + (b + frac) * width, 6))
        return n, out

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counts = np.asarray(state.get[0], dtype=np.int64)
        else:
            counts = np.zeros(n_bins, dtype=np.int64)
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype=np.float64)
            bins = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
            counts += np.bincount(bins, minlength=n_bins).astype(np.int64)
        state.update((counts.tolist(),))
        n, est = estimate(counts)
        row = {key_col: [key[0]], "n": [n]}
        for c, e in zip(qcols, est):
            row[c] = [e]
        yield pd.DataFrame(row)

    keyed = values.select(
        F.col(key_col).cast("long").alias(key_col), F.col(value_col)
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
