"""Corpus-level training-data operators: benchmark decontamination and
fixed-length sequence packing (BASELINE.json north-star extensions; no
counterpart in the reference — these are the steps every LLM
pre-training pipeline runs between "clean corpus" and "training
shards").

Both operators are pure DataFrame compositions: the decontamination
join broadcasts only the (small) eval-set shingle vocabulary, and the
packer's only shuffle is the per-shard hash partitioning it needs
anyway to write shard files — so the plans are unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.dedup import shingle_hashes


def contaminated_docs(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: training documents sharing at least
    one word ``n``-gram shingle with the held-out eval set, with the
    count of shared distinct shingles per document (the GPT-3 /
    The-Pile overlap rule, word-n-gram variant).

    Plan shape for 100 TB: eval benchmarks are KB-to-MB scale next to
    a TB train corpus, so the eval side collapses to a deduped shingle
    vocabulary that is explicitly broadcast; the train side streams
    through one scan -> Arrow shingle kernel -> explode -> broadcast
    hash join -> per-doc count. No shuffle ever carries the corpus —
    only (doc_id, shingle_hash) pairs that actually hit the eval
    vocabulary reach the aggregate.

    Returns (id_col, n_shared_shingles); downstream callers anti-join
    this frame to drop (or quarantine) contaminated documents.
    """
    ev = (
        eval_set.select(F.explode(shingle_hashes(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col), F.explode(shingle_hashes(F.col(text_col), n)).alias("sh")
    )
    # shingle_hashes is distinct within a document, so count(*) is the
    # per-doc count of DISTINCT shared shingles without a re-dedup.
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def pack_sequences(
    docs: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seq_len: int = 512,
    shard_method: str = "md5",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style batch layout):
    documents are concatenated in deterministic (shard, id) order and
    the token stream is split into fixed ``seq_len`` windows; each
    document is assigned the sequence index and intra-sequence offset
    where its tokens begin.

    Scale shape: a global concatenation order would need a global sort,
    so the order is per-shard — shard by a pure hash of the id (same
    contract as ``sinks.shard_id``: partitioning-invariant, retry-safe)
    and pack independently within each shard. The only exchange is the
    per-shard hash partitioning; the running-token-count window runs
    inside it. At 100 TB you raise ``n_shards`` with the corpus, so
    per-shard state stays bounded and every shard packs in parallel.

    Returns (id_col, shard_id, pack_seq, token_offset) — all integers,
    a pure function of (ids, token counts), so two runs (or two
    engines) agree bit-for-bit.
    """
    from data_pipeline_project_spark.sinks.sinks import shard_id

    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_count_col).over(w) - F.col(token_count_col)).cast("long")
    return (
        docs.withColumn(
            "shard_id", shard_id(F.col(id_col), n_shards, method=shard_method)
        )
        .withColumn("_start", start)
        .select(
            F.col(id_col),
            F.col("shard_id"),
            (F.col("_start") / seq_len).cast("long").alias("pack_seq"),
            (F.col("_start") % seq_len).cast("long").alias("token_offset"),
        )
    )
