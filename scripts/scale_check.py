#!/usr/bin/env python
"""Empirical scale validation: run the heavy operator tier at ~sf1.0
(10x the sf0.1 tables, synthesized deterministically from sf0.1 by
id-shifted replication) and record per-query wall time + the scaling
factor vs sf0.1.

The 10x corpus is deliberately NEAR-DUP-HEAVY: each replica's text
gets a distinct one-token suffix, so every sf0.1 document becomes a
10-document near-dup cluster — jaccard ~0.9+ pairs, 45 pairs per
cluster. That stresses exactly the paths whose 100 TB behavior the
plan arguments claim (banded LSH bucket joins, candidate verification,
connected components over a pair graph ~45x the base corpus's).

Usage: python scripts/scale_check.py [--base /root/testdata/sf0.1]
       [--out /tmp/scale_sf1] [--skip-gen]
Writes one JSON line per query to stdout and a summary at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_project_spark.session import get_spark  # noqa: E402
from data_pipeline_project_spark.sources.tables import load_table  # noqa: E402

REPLICAS = 10

# Heavy tier: the queries whose scale behavior the plan assertions
# argue about, and which sf0.1 BENCH numbers exist for.
HEAVY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf_fullprobe",
    "tfidf_top_terms",
    "token_count_bpe",
    "text_stats",
    "clean_corpus_pipeline",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "round_robin_synthetic_key",
    # round-5 corpus tier (non-registry; resolved from plans modules).
    # decontamination on the replicated corpus is the worst case: every
    # replica of an eval doc's base text shares most shingles with it.
    "decontamination_overlap",
    "repetition_quality_flags",
    "unigram_logprob_score",
    "sequence_packing",
    "embedding_int8_quantization",
    # round-5 extension batch (results in SCALE_r05.md)
    "duplicate_passages",
    "incremental_agg_merge",
    "incremental_agg_retract",
    "data_expectations",
    "corpus_mixture_sample",
    "interval_overlap_windows",
]


def resolve_query(name: str):
    """Registry first; fall back to the plans modules for the
    oracle-checked queries outside the 50-slot driver window."""
    import importlib

    from data_pipeline_project_spark.plans.registry import get_queries

    queries = get_queries()
    if name in queries:
        return queries[name]
    for mod_name in ("llmops_queries", "relational_queries", "temporal_queries"):
        mod = importlib.import_module(
            f"data_pipeline_project_spark.plans.{mod_name}"
        )
        if hasattr(mod, name):
            return getattr(mod, name)
    raise KeyError(name)


def generate(spark, base: str, out: str) -> None:
    """Deterministic 10x replication with shifted ids. documents get a
    per-replica token suffix (near-dup clusters); embeddings replicate
    exactly (duplicate-vector stress for the LSH/IVF bucketing);
    lineitem/orders shift their keys; small dims copy through."""
    os.makedirs(out, exist_ok=True)

    docs = load_table(spark, "documents", base)
    n_docs = docs.count()
    reps = None
    for r in range(REPLICAS):
        part = docs.select(
            (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load_table(spark, "embeddings", base)
    n_emb = emb.count()
    reps = None
    for r in range(REPLICAS):
        part = emb.select(
            (F.col("vec_id") + F.lit(r * n_emb)).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    li = load_table(spark, "lineitem", base)
    hi_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    reps = None
    for r in range(REPLICAS):
        part = li.select(
            (F.col("l_orderkey") + F.lit(r * hi_ok)).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    orders = load_table(spark, "orders", base)
    reps = None
    for r in range(REPLICAS):
        part = orders.select(
            (F.col("o_orderkey") + F.lit(r * hi_ok)).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    ev = load_table(spark, "events", base)
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    reps = None
    for r in range(REPLICAS):
        part = ev.select(
            (F.col("event_id") + F.lit(r * n_ev)).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
        reps = part if reps is None else reps.unionByName(part)
    # events.ts is TIMESTAMP(NANOS) read as long via load_table's conf;
    # writing back produces plain LONG — load_table reads both fine.
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in ("customer", "supplier", "part", "nation", "region"):
        load_table(spark, t, base).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", default=",".join(HEAVY))
    args = ap.parse_args()

    spark = get_spark(app_name="scale-check")
    if not args.skip_gen:
        t0 = time.perf_counter()
        generate(spark, args.base, args.out)
        print(json.dumps({"gen_seconds": round(time.perf_counter() - t0, 1)}))

    results: dict[str, dict] = {}
    for name in args.queries.split(","):
        fn = resolve_query(name)
        # warm pass at sf0.001 (class loading), then timed at base and 10x
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        row = {}
        for label, d in (("sf0.1", args.base), ("sf1.0", args.out)):
            # deregistered queries bypass the registry's persist-release
            from data_pipeline_project_spark.functions.persist_scope import (
                release_scoped_persists,
            )

            release_scoped_persists()
            t0 = time.perf_counter()
            try:
                out_df = fn(spark, d)
                out_df.write.format("noop").mode("overwrite").save()
                row[label] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                row[label] = None
                row[f"{label}_err"] = f"{type(exc).__name__}: {exc}"[:300]
        if row.get("sf0.1") and row.get("sf1.0"):
            row["ratio"] = round(row["sf1.0"] / row["sf0.1"], 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
