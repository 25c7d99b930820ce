"""Distributed BPE training (operators/tokenizer.py) vs a single-node
textbook implementation (Sennrich et al. 2016 pseudocode)."""

from collections import defaultdict

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.text import tokens
from data_pipeline_project_spark.operators.tokenizer import (
    END_OF_WORD,
    bpe_segment,
    train_bpe,
    word_vocab,
)
from tests.conftest import SF_SMALL


def _ref_bpe(word_counts, num_merges, min_pair_count=2):
    """Textbook BPE with the same deterministic tiebreak: best pair by
    count desc, then lexicographic (a, b) asc."""
    vocab = defaultdict(int)
    for w, c in word_counts.items():
        vocab[tuple(list(w) + [END_OF_WORD])] += c
    merges = []
    for _ in range(num_merges):
        counts = defaultdict(int)
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        nxt = defaultdict(int)
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nxt[tuple(res)] += c
        vocab = nxt
    return merges, vocab


def _word_counts(spark, n_docs):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(n_docs)
    wc = {
        r.word: r["count"]
        for r in word_vocab(docs).collect()
    }
    return docs, wc


def test_train_bpe_matches_reference_on_corpus(spark):
    docs, wc = _word_counts(spark, 60)
    got = train_bpe(docs, num_merges=20)
    want, _ = _ref_bpe(wc, 20)
    assert got == want


def test_train_bpe_classic_toy_example(spark):
    rows = [(1, "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = train_bpe(docs, num_merges=10)
    wc = {
        r.word: r["count"]
        for r in word_vocab(docs).collect()
    }
    want, _ = _ref_bpe(wc, 10)
    assert got == want
    # 'est</w>' must emerge as a unit for this classic corpus.
    symbols = {a + b for a, b in got}
    assert any(s.endswith("est" + END_OF_WORD) or s == "est" for s in symbols)


def test_bpe_segment_replays_training_state(spark):
    """Applying the learned merges to each distinct word reproduces the
    reference trainer's final vocabulary segmentation."""
    docs, wc = _word_counts(spark, 40)
    merges = train_bpe(docs, num_merges=16)
    _, ref_vocab = _ref_bpe(wc, 16)
    ref_by_word = {}
    for w in wc:
        syms = tuple(list(w) + [END_OF_WORD])
        for a, b in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = tuple(res)
        ref_by_word[w] = list(syms)

    words = docs.select(F.explode(tokens(F.col("text"))).alias("word")).distinct()
    got = {
        r.word: list(r.syms)
        for r in words.select("word", bpe_segment(F.col("word"), merges).alias("syms")).collect()
    }
    assert got == ref_by_word
    # and the reference's final vocab states are exactly the multiset of
    # per-word segmentations
    assert set(map(tuple, got.values())) == set(ref_vocab.keys())


def test_bpe_save_load_roundtrip(spark, tmp_path):
    """Train -> save -> load must reproduce the exact merge list AND
    identical segmentations (merges are order-sensitive, so the loader
    must replay training order, not file order)."""
    from data_pipeline_project_spark.operators.tokenizer import (
        bpe_segment,
        load_bpe,
        save_bpe,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widest " * 3) for i in range(4)],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, num_merges=12)
    assert merges, "training produced no merges"

    path = str(tmp_path / "bpe_merges")
    save_bpe(spark, merges, path)
    reloaded = load_bpe(spark, path)
    assert reloaded == merges

    words = spark.createDataFrame(
        [("lowest",), ("newer",), ("unseen",)], ["word"]
    )
    a = {r.word: list(r.syms) for r in words.select(
        "word", bpe_segment(F.col("word"), merges).alias("syms")).collect()}
    b = {r.word: list(r.syms) for r in words.select(
        "word", bpe_segment(F.col("word"), reloaded).alias("syms")).collect()}
    assert a == b
