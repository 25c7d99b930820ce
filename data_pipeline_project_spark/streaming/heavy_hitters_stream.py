"""Streaming heavy hitters: a sharded Misra-Gries summary maintained in
the engine's state store across micro-batches.

The batch operator (operators/sketches.heavy_hitters) answers "which
terms exceed n/k of THIS dataset"; a monitoring stream needs the same
answer continuously over an unbounded stream without unbounded state.
Misra-Gries is MERGEABLE (Agarwal et al.), so each shard of the term
space keeps an independent k-counter summary in per-key state
(applyInPandasWithState; RocksDB-backed on a cluster) and every
micro-batch folds its term counts in and re-compresses — state per
shard is O(k) forever, total state O(n_shards * k) regardless of
stream length.

Sharding by term hash preserves the guarantee per shard: a term's
counter underestimates its true stream frequency by at most
(shard stream length)/(k+1), and every term above that bound is
present. Emission is update-mode: each batch re-emits a shard's
current counters, so the LATEST rows per shard are the live summary
(exactly how a monitoring dashboard consumes it).

No reference counterpart; this is the streaming twin of the batch
sketch tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_project_spark.operators.text import token_hash

HH_OUT_SCHEMA = "shard int, item string, weight long"
HH_STATE_SCHEMA = "items array<string>, weights array<long>"


def streaming_heavy_hitters(
    terms: DataFrame,
    k: int = 8,
    n_shards: int = 4,
    term_col: str = "term",
) -> DataFrame:
    """``terms`` is a streaming frame with ``term_col``; returns the
    update-mode stream of (shard, item, weight) Misra-Gries counters."""

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, weights = state.get
            counters = dict(zip(list(items), [int(w) for w in weights]))
        else:
            counters = {}
        for pdf in batches:
            for v, c in pdf[term_col].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                thr = sorted(counters.values(), reverse=True)[k]
                counters = {x: c - thr for x, c in counters.items() if c > thr}
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters.keys()),
                "weight": list(counters.values()),
            }
        )

    keyed = terms.select(
        (token_hash(F.col(term_col)) % n_shards).cast("int").alias("shard"),
        F.col(term_col).alias(term_col),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
