"""End-to-end streaming corpus ingest: JSONL drops → quarantine split →
incremental dedup against the historical corpus → hash-sharded parquet
append.

This composes the engine's training-data parts into the pipeline a
corpus build actually runs continuously:

- **source**: Structured Streaming text scan over a drop directory,
  parsed with the same explicit-schema ``from_json`` contract as the
  batch JSONL source (``sources/jsonl_source.py``) — splittable,
  PERMISSIVE, corrupt lines quarantined per micro-batch, never fatal;
- **dedup**: each batch is deduped within itself (first arrival wins)
  and then against the ENTIRE historical corpus via the Bloom-prefilter
  path (``operators/incremental.py``). The filter is built once at
  stream start from the existing corpus and maintained incrementally
  (``bloom_add``) as batches append — steady state, a micro-batch costs
  one broadcast membership test plus an exact verification scan that is
  **partition-pruned to the shards the candidate keys hash to** (shard
  id is a pure function of the key, so the prune list is exact);
- **decontamination** (optional): an eval/benchmark document set given
  at stream start is reduced once to its persisted shingle vocabulary;
  every micro-batch broadcast-joins against it and docs sharing
  ``decontam_min_shared``+ trigram shingles divert to a decontam audit
  path instead of the corpus — the batch ``contaminated_docs`` rule
  running continuously at ingest time;
- **sink**: survivors append as ``shard=k/`` Hive partitions
  (``sinks.shard_id`` layout — the training-shard contract), quarantined
  raw lines append beside them for audit.

Exactly-once without a transaction log: ``foreachBatch`` may replay a
batch after a crash, but a replayed batch re-runs the SAME dedup
against a corpus that now already contains its rows — every row is
bloom-positive, verification matches it, nothing appends twice. The
dedup IS the idempotency mechanism (same principle as the reference's
upsert-key replay safety, `pipeline.py:240-243` / K2/K3, applied to an
append-only corpus).

Scale notes: the driver holds one bitmap (~1.2 GB per 10^9 keys at 1%
fpp — fine for a driver; shard the filter by key range beyond that).
fpp degrades as the corpus outgrows ``expected_total_docs``; the
ingestor TRACKS cumulative insertions, exposes the resulting
effective-fpp estimate, and AUTO-REBUILDS the filter from the real
corpus at double the sizing whenever insertions exceed what it was
sized for — saturation costs one corpus scan per capacity doubling
(O(log growth) rebuilds total) instead of silently degrading the
prefilter toward verify-everything.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_project_spark.operators.incremental import (
    bloom_add,
    bloom_parameters,
    build_bloom,
    incremental_dedup,
)
from data_pipeline_project_spark.sinks.sinks import shard_id
from data_pipeline_project_spark.sources.jsonl_source import (
    CORRUPT_COL,
    DOCUMENT_JSONL_SCHEMA,
    FILE_COL,
    split_corrupt,
)


def read_documents_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_JSONL_SCHEMA,
    reader_options: dict | None = None,
) -> DataFrame:
    """Streaming twin of ``read_documents_jsonl``: same parse contract,
    file-source checkpointing supplies exactly-once file tracking (the
    reference's recently_processed set, S3, for free).
    ``reader_options``: file-source knobs (e.g. maxFilesPerTrigger)."""
    reader = spark.readStream
    for key, val in (reader_options or {}).items():
        reader = reader.option(key, val)
    raw = (
        reader.text(path)
        .select(F.col("_metadata.file_name").alias(FILE_COL), "value")
        .where(F.trim("value") != "")
    )
    parsed = raw.select(
        FILE_COL,
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_rec"),
    )
    return parsed.select(FILE_COL, "_rec.*")


@dataclass
class IngestStats:
    batches: int = 0
    rows_seen: int = 0
    rows_quarantined: int = 0
    rows_appended: int = 0
    rows_deduped: int = 0
    rows_decontaminated: int = 0
    bloom_rebuilds: int = 0
    history: list[dict] = field(default_factory=list)


class CorpusIngestor:
    """foreachBatch processor maintaining the corpus + its Bloom filter.

    One instance per stream run; ``process_batch`` is the callback for
    ``writeStream.foreachBatch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus_path: str,
        quarantine_path: str,
        key_col: str = "doc_id",
        n_shards: int = 16,
        expected_total_docs: int = 1_000_000,
        fpp: float = 0.01,
        eval_docs: DataFrame | None = None,
        decontam_min_shared: int = 1,
        decontam_path: str | None = None,
        text_col: str = "text",
    ):
        self.spark = spark
        self.corpus_path = corpus_path
        self.quarantine_path = quarantine_path
        self.key_col = key_col
        self.n_shards = n_shards
        self.stats = IngestStats()
        self.fpp = fpp
        # Decontamination gate: the eval set's shingle vocabulary is
        # computed ONCE at stream start and persisted (eval benchmarks
        # are KB-to-MB scale; the vocabulary is smaller still), then
        # broadcast against every micro-batch — same operator contract
        # as operators/corpus.contaminated_docs, applied continuously.
        self.text_col = text_col
        self.decontam_min_shared = decontam_min_shared
        self.decontam_path = decontam_path or (quarantine_path + "_decontam")
        if eval_docs is not None:
            from data_pipeline_project_spark.operators.dedup import shingle_hashes

            self.eval_sh = (
                eval_docs.select(
                    F.explode(shingle_hashes(F.col(text_col))).alias("sh")
                )
                .distinct()
                .persist()
            )
            self.eval_sh.count()  # materialize before the stream starts
        else:
            self.eval_sh = None
        # Size for where the corpus is GOING, not where it is, so
        # incremental adds stay within the design fpp. sized_n /
        # inserted drive the saturation guard: once insertions pass the
        # sizing, _rebuild doubles the filter (see module docstring).
        self.sized_n = expected_total_docs
        self.m_bits, self.k = bloom_parameters(expected_total_docs, fpp)
        if self._corpus_exists():
            corpus = self._read_corpus()
            self.inserted = corpus.count()
            self.bitmap, _, _ = build_bloom(
                corpus, key_col, expected_items=expected_total_docs, fpp=fpp,
            )
        else:
            self.inserted = 0
            self.bitmap = bytes(self.m_bits // 8)

    def effective_fpp(self) -> float:
        """Estimated CURRENT false-positive probability from the
        standard Bloom formula (1 - e^{-kn/m})^k with n = cumulative
        insertions — at or below the design ``fpp`` while the guard
        holds. fpp only costs verification work (false positives are
        exactly re-checked), never correctness."""
        return (1.0 - math.exp(-self.k * self.inserted / self.m_bits)) ** self.k

    def _rebuild(self) -> None:
        """Double the filter sizing and rebuild from the REAL corpus —
        drift can never compound, and doubling amortizes rebuild scans
        to O(log growth) over the corpus's lifetime."""
        self.sized_n = max(self.sized_n * 2, self.inserted * 2)
        self.m_bits, self.k = bloom_parameters(self.sized_n, self.fpp)
        if self._corpus_exists():
            self.bitmap, _, _ = build_bloom(
                self._read_corpus(), self.key_col,
                expected_items=self.sized_n, fpp=self.fpp,
            )
        else:
            self.bitmap = bytes(self.m_bits // 8)
        self.stats.bloom_rebuilds += 1

    def _corpus_exists(self) -> bool:
        """True only when the corpus holds actual data files (a bare
        pre-created directory is an empty corpus)."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.corpus_path)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return False
        it = fs.listFiles(p, True)
        while it.hasNext():
            if not it.next().getPath().getName().startswith(("_", ".")):
                return True
        return False

    def _read_corpus(self, shards: list[int] | None = None) -> DataFrame:
        df = self.spark.read.option("basePath", self.corpus_path).parquet(
            self.corpus_path
        )
        if shards is not None:
            # Exact partition prune: shard is a pure function of the
            # key, so only these directories can hold a match.
            df = df.where(F.col("shard").isin(shards))
        return df

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        clean, quarantined = split_corrupt(batch)
        n_quar = quarantined.count()
        if n_quar:
            quarantined.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(self.quarantine_path)

        # Within-batch first-arrival dedup, then shard assignment (the
        # same pure hash the corpus layout uses).
        keyed = clean.where(F.col(self.key_col).isNotNull()).localCheckpoint()
        # ONE audit job for both counts (r14, verdict item 6): keyed's
        # row count is n_raw, and its DISTINCT key count equals
        # sharded.count() by construction (dropDuplicates on the key
        # emits one row per key) — so the separate sharded.count() job
        # per micro-batch is gone. Observation was considered and
        # rejected: its session-state poisons later pyspark.ml jobs on
        # the same session (r6 gotcha, test_quality_model).
        audit = keyed.agg(
            F.count(F.lit(1)).alias("_n_raw"),
            F.count_distinct(F.col(self.key_col)).alias("_n_in"),
        ).first()
        n_raw = audit["_n_raw"]
        sharded = (
            keyed.dropDuplicates([self.key_col])
            .withColumn("shard", shard_id(F.col(self.key_col), self.n_shards))
            .localCheckpoint()  # consumed 3x (shards, dedup, write); small
        )
        n_in = audit["_n_in"]

        # Decontamination gate: docs sharing >= decontam_min_shared
        # trigram shingles with the eval set divert to the decontam
        # audit path and never reach the corpus. Replay-safe for the
        # same reason the dedup is: a replayed batch re-derives the
        # same contaminated set (pure function of batch + eval set).
        n_contam = 0
        if self.eval_sh is not None and n_in:
            # Same plan as operators/corpus.contaminated_docs, with the
            # eval side already reduced to its persisted shingle
            # vocabulary at stream start.
            from data_pipeline_project_spark.operators.dedup import (
                shingle_hashes,
            )

            contam_keys = (
                sharded.select(
                    F.col(self.key_col),
                    F.explode(shingle_hashes(F.col(self.text_col))).alias("sh"),
                )
                .join(F.broadcast(self.eval_sh), "sh")
                .groupBy(self.key_col)
                .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
                .where(F.col("n_shared_shingles") >= self.decontam_min_shared)
                .select(self.key_col)
            )
            diverted = sharded.join(
                F.broadcast(contam_keys), self.key_col, "left_semi"
            )
            n_contam = diverted.count()
            if n_contam:
                diverted.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(self.decontam_path)
                sharded = sharded.join(
                    F.broadcast(contam_keys), self.key_col, "left_anti"
                ).localCheckpoint()
                n_in -= n_contam

        if n_in and self._corpus_exists():
            shards = [
                r.shard for r in sharded.select("shard").distinct().collect()
            ]
            historical = self._read_corpus(shards)
            fresh = incremental_dedup(
                sharded, historical, self.key_col,
                bloom=(self.bitmap, self.m_bits, self.k),
            ).localCheckpoint()  # consumed 2x (write + bloom_add)
        else:
            fresh = sharded
        n_new = fresh.count()

        if n_new:
            fresh.write.mode("append").partitionBy("shard").parquet(
                self.corpus_path
            )
            self.bitmap = bloom_add(
                fresh, self.key_col, self.bitmap, self.m_bits, self.k
            )
            self.inserted += n_new
            # Saturation guard: past the sizing, each further insert
            # pushes fpp above design — rebuild at double capacity now
            # rather than degrade toward verify-everything.
            if self.inserted > self.sized_n:
                self._rebuild()

        s = self.stats
        s.batches += 1
        s.rows_seen += n_raw + n_quar
        s.rows_quarantined += n_quar
        s.rows_appended += n_new
        s.rows_decontaminated += n_contam
        s.rows_deduped += n_raw - n_new - n_contam  # within-batch + vs-corpus
        s.history.append(
            {
                "batch_id": batch_id, "in": n_raw, "new": n_new,
                "quar": n_quar, "contam": n_contam,
                "fpp": round(self.effective_fpp(), 6),
            }
        )


def start_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    **ingestor_kwargs,
):
    """Wire source → ingestor → sinks and start the query. Returns
    ``(streaming_query, ingestor)`` — the ingestor exposes stats and
    the live Bloom filter. ``available_now=True`` drains existing files
    and stops (the batch-catchup trigger); False runs continuously.
    ``max_files_per_trigger`` bounds batch size (and makes each drop
    file its own dedup round when set to 1)."""
    ingestor = CorpusIngestor(spark, corpus_path, quarantine_path, **ingestor_kwargs)
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    stream = read_documents_jsonl_stream(spark, source_dir, reader_options=opts)
    writer = (
        stream.writeStream.foreachBatch(ingestor.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start(), ingestor
