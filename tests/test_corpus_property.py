"""Property tests: the corpus-tier operators must agree with
straightforward single-node simulators on randomized inputs — small id
and count domains force the interesting collisions (empty docs, shard
boundary crossings, docs longer than a whole sequence, duplicate token
counts).

One Spark session (suite fixture) evaluates all hypothesis examples;
deadline disabled accordingly (same pattern as tests/test_scd_property.py).
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_project_spark.operators.corpus import (
    pack_sequences,
    repetition_flags,
)

# (doc_id, n_tok) — counts 0..300 cross the seq_len=64 boundary in
# every way: zero-token docs, exact multiples, straddlers.
_sized_docs = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 300)),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


def _md5_shard(doc_id: int, n_shards: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % n_shards


def _simulate_packing(rows, n_shards, seq_len):
    out = {}
    shards: dict = {}
    for doc_id, n_tok in rows:
        shards.setdefault(_md5_shard(doc_id, n_shards), []).append((doc_id, n_tok))
    for shard, docs in shards.items():
        run = 0
        for doc_id, n_tok in sorted(docs):
            out[doc_id] = (shard, run // seq_len, run % seq_len)
            run += n_tok
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_sized_docs)
def test_pack_sequences_matches_simulator(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, n_tok int")
    got = {
        r.doc_id: (r.shard_id, r.pack_seq, r.token_offset)
        for r in pack_sequences(df, "n_tok", n_shards=4, seq_len=64).collect()
    }
    assert got == _simulate_packing(rows, 4, 64)


# Small vocabulary + short docs force repeated n-grams organically.
_texts = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.lists(st.sampled_from(["a", "bb", "ccc", "dd"]), max_size=12).map(
            " ".join
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _simulate_repetition(rows):
    out = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        tri = _grams(toks, 3)
        dup = round(1.0 - len(set(tri)) / len(tri), 6) if tri else 0.0
        bi = _grams(toks, 2)
        top = round(max(bi.count(b) for b in set(bi)) / len(bi), 6) if bi else 0.0
        out[doc_id] = (dup, top, dup > 0.2 or top > 0.18)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_texts)
def test_repetition_flags_match_simulator(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.dup_trigram_frac, r.top_bigram_frac, r.is_repetitive)
        for r in repetition_flags(df).collect()
    }
    assert got == _simulate_repetition(rows)
