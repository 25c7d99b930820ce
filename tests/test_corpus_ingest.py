"""Streaming corpus ingest (streaming/corpus_ingest.py): quarantine
split, cross-batch dedup against the growing corpus, shard layout, and
replay idempotency."""

import json

import pytest

from pyspark.sql import functions as F

from data_pipeline_project_spark.sources.jsonl_source import read_documents_jsonl
from data_pipeline_project_spark.streaming.corpus_ingest import (
    CorpusIngestor,
    start_corpus_ingest,
)


def _write_jsonl(path, doc_ids, corrupt_lines=0):
    with open(path, "w") as f:
        for i in doc_ids:
            f.write(json.dumps({"doc_id": i, "text": f"doc number {i}",
                                "meta": {"src": "test"}}) + "\n")
        for j in range(corrupt_lines):
            f.write("{this is not json%d\n" % j)


@pytest.fixture
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("drop", "corpus", "quar", "ckpt")}
    (tmp_path / "drop").mkdir()
    return d


def test_end_to_end_ingest_with_dedup_across_runs(spark, dirs):
    # Run 1: 50 docs + 2 corrupt lines.
    _write_jsonl(f"{dirs['drop']}/b1.jsonl", range(50), corrupt_lines=2)
    q, ing = start_corpus_ingest(
        spark, dirs["drop"], dirs["corpus"], dirs["quar"], dirs["ckpt"],
        expected_total_docs=10_000,
    )
    q.awaitTermination(120)
    assert ing.stats.rows_appended == 50
    assert ing.stats.rows_quarantined == 2
    assert spark.read.parquet(dirs["corpus"]).count() == 50
    assert spark.read.parquet(dirs["quar"]).count() == 2

    # Run 2: a new drop overlapping 25 ids; only the 25 new ones land.
    _write_jsonl(f"{dirs['drop']}/b2.jsonl", range(25, 75))
    q2, ing2 = start_corpus_ingest(
        spark, dirs["drop"], dirs["corpus"], dirs["quar"], dirs["ckpt"],
        expected_total_docs=10_000,
    )
    q2.awaitTermination(120)
    assert ing2.stats.rows_appended == 25
    assert ing2.stats.rows_deduped == 25
    corpus = spark.read.parquet(dirs["corpus"])
    assert corpus.count() == 75
    assert sorted(r.doc_id for r in corpus.collect()) == list(range(75))


def test_shard_layout_is_deterministic(spark, dirs):
    _write_jsonl(f"{dirs['drop']}/b1.jsonl", range(200))
    q, _ = start_corpus_ingest(
        spark, dirs["drop"], dirs["corpus"], dirs["quar"], dirs["ckpt"],
        n_shards=8, expected_total_docs=10_000,
    )
    q.awaitTermination(120)
    from data_pipeline_project_spark.sinks.sinks import shard_id

    corpus = spark.read.parquet(dirs["corpus"])
    # Hive partition value equals the recomputed pure-function shard id
    # for every row.
    mismatch = corpus.where(
        F.col("shard") != shard_id(F.col("doc_id"), 8)
    ).count()
    assert mismatch == 0
    assert corpus.select("shard").distinct().count() <= 8


def test_replayed_batch_appends_nothing(spark, dirs):
    _write_jsonl(f"{dirs['drop']}/b1.jsonl", range(30))
    batch = read_documents_jsonl(spark, f"{dirs['drop']}/b1.jsonl")
    ing = CorpusIngestor(
        spark, dirs["corpus"], dirs["quar"], expected_total_docs=10_000
    )
    ing.process_batch(batch, 0)
    assert spark.read.parquet(dirs["corpus"]).count() == 30

    ing.process_batch(batch, 0)  # crash-replay of the same batch
    assert spark.read.parquet(dirs["corpus"]).count() == 30
    assert ing.stats.rows_appended == 30  # second pass appended 0

    # A fresh ingestor (driver restart: bloom rebuilt from the corpus)
    # must also treat the replay as already-ingested.
    ing2 = CorpusIngestor(
        spark, dirs["corpus"], dirs["quar"], expected_total_docs=10_000
    )
    ing2.process_batch(batch, 0)
    assert spark.read.parquet(dirs["corpus"]).count() == 30
    assert ing2.stats.rows_appended == 0
    assert ing2.stats.rows_deduped == 30


def test_bloom_saturation_guard_rebuilds_and_bounds_fpp(spark, dirs):
    """Insertions far past the original sizing must trigger capacity-
    doubling rebuilds that keep the effective fpp at/below design —
    not silently degrade the prefilter. Correctness (exact dedup) must
    hold throughout regardless."""
    ing = CorpusIngestor(
        spark, dirs["corpus"], dirs["quar"],
        expected_total_docs=50, fpp=0.01,  # deliberately undersized
    )
    m0 = ing.m_bits
    for b in range(4):  # 4 x 50 = 200 keys = 4x the sizing
        p = f"{dirs['drop']}/b{b}.jsonl"
        _write_jsonl(p, range(b * 50, (b + 1) * 50))
        ing.process_batch(read_documents_jsonl(spark, p), b)

    assert ing.stats.bloom_rebuilds >= 1
    assert ing.sized_n >= 200 and ing.m_bits > m0
    assert ing.inserted == 200
    # Post-guard the filter is sized at >= 2x the inserted count, so
    # the estimate sits strictly below the design fpp.
    assert ing.effective_fpp() <= 0.01
    # And per-batch history carries the estimate for observability.
    assert all("fpp" in h for h in ing.stats.history)

    # Exact dedup unaffected by rebuilds: replay everything, nothing lands.
    p = f"{dirs['drop']}/replay.jsonl"
    _write_jsonl(p, range(200))
    before = spark.read.parquet(dirs["corpus"]).count()
    ing.process_batch(read_documents_jsonl(spark, p), 99)
    assert spark.read.parquet(dirs["corpus"]).count() == before == 200


def test_null_key_rows_are_dropped_not_crashing(spark, dirs):
    p = f"{dirs['drop']}/b1.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": None, "text": "no id", "meta": {}}) + "\n")
        f.write(json.dumps({"doc_id": 1, "text": "ok", "meta": {}}) + "\n")
    ing = CorpusIngestor(
        spark, dirs["corpus"], dirs["quar"], expected_total_docs=1_000
    )
    ing.process_batch(read_documents_jsonl(spark, p), 0)
    assert spark.read.parquet(dirs["corpus"]).count() == 1


def test_decontamination_gate_diverts_eval_overlap(spark, dirs, tmp_path):
    """Docs sharing trigrams with the eval set never reach the corpus;
    they land in the decontam audit path with counts in stats."""
    with open(f"{dirs['drop']}/b1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "held out benchmark answer key alpha beta",
                            "meta": {"src": "t"}}) + "\n")   # leaks eval text
        f.write(json.dumps({"doc_id": 2, "text": "perfectly ordinary training material here",
                            "meta": {"src": "t"}}) + "\n")
    eval_docs = spark.createDataFrame(
        [(100, "the held out benchmark answer key alpha beta gamma")],
        ["doc_id", "text"],
    )
    q, ing = start_corpus_ingest(
        spark, dirs["drop"], dirs["corpus"], dirs["quar"], dirs["ckpt"],
        expected_total_docs=10_000, eval_docs=eval_docs,
    )
    q.awaitTermination(120)
    assert ing.stats.rows_decontaminated == 1
    assert ing.stats.rows_appended == 1
    corpus = spark.read.parquet(dirs["corpus"])
    assert [r.doc_id for r in corpus.collect()] == [2]
    diverted = spark.read.parquet(ing.decontam_path)
    assert [r.doc_id for r in diverted.collect()] == [1]

    # Replay safety: a second run over the same (already-processed)
    # drop plus one new clean doc appends only the new doc and
    # re-diverts nothing.
    with open(f"{dirs['drop']}/b2.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": "more clean training material arrives",
                            "meta": {"src": "t"}}) + "\n")
    q2, ing2 = start_corpus_ingest(
        spark, dirs["drop"], dirs["corpus"], dirs["quar"], dirs["ckpt"],
        expected_total_docs=10_000, eval_docs=eval_docs,
    )
    q2.awaitTermination(120)
    assert ing2.stats.rows_decontaminated == 0
    assert ing2.stats.rows_appended == 1
    assert spark.read.parquet(dirs["corpus"]).count() == 2
