"""Streaming distinct counts: HyperLogLog registers in per-key state —
the third mergeable streaming sketch beside heavy hitters (Misra-
Gries) and quantiles (histogram).

"How many unique users/documents/keys so far" over an unbounded
stream is the canonical unmergeable-exactly problem: exact state is
the key set itself (unbounded). HLL state is 2^p registers FOREVER
(p=9 -> 512 bytes/key at ~4.6% error; p is the knob), register merge
is element-wise max (so micro-batches, shards, and replays all
compose), and the estimate is the standard bias-corrected harmonic
mean with the small-range linear-counting correction. The hash is the
engine-wide md5-prefix (operators/text.token_hash's mechanism), so
the sketch is deterministic across runs and engines.

Per-key state via applyInPandasWithState; update-mode emission — the
latest row per key is the live distinct-count dashboard.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_project_spark.functions.md5_batch import md5_prefix60_strings


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return est


def streaming_distinct_count(
    items: DataFrame,
    key_col: str,
    item_col: str,
    p: int = 9,
) -> DataFrame:
    """``items`` is a streaming frame; returns the update-mode stream
    of (key, estimate) approximate distinct ``item_col`` counts."""
    m = 1 << p
    out_schema = f"{key_col} long, estimate double"
    state_schema = "regs array<int>"

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs = np.asarray(state.get[0], dtype=np.int64)
        else:
            regs = np.zeros(m, dtype=np.int64)
        for pdf in batches:
            vals = pdf[item_col].dropna().astype(str).tolist()
            if not vals:
                continue
            # one batched md5 per micro-batch (guide §4.2 — no
            # per-value Python hashing in the state kernel)
            h = md5_prefix60_strings(vals)
            idx = h & (m - 1)
            rest = (h >> p).astype(np.uint64)
            # exact vectorized bit_length via binary-search shifts
            # (no float log: log2 rounding near 2^k boundaries would
            # corrupt ranks)
            bl = np.zeros(len(rest), dtype=np.int64)
            cur = rest.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                big = cur >= (np.uint64(1) << np.uint64(shift))
                bl[big] += shift
                cur[big] >>= np.uint64(shift)
            bl[cur > 0] += 1  # cur is now 0 or 1
            rank = (60 - p) - bl + 1
            np.maximum.at(regs, idx, rank)
        state.update((regs.tolist(),))
        yield pd.DataFrame(
            {key_col: [key[0]], "estimate": [round(_hll_estimate(regs), 2)]}
        )

    keyed = items.select(
        F.col(key_col).cast("long").alias(key_col), F.col(item_col)
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
