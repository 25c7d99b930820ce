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


# ---- duplicate passages vs DP reference ------------------------------------

_passage_docs = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=40),
    ),
    min_size=2,
    max_size=8,
    unique_by=lambda t: t[0],
)


def _dp_spans(docs, k, min_tokens):
    """Single-node reference: maximal cross-doc common token runs of
    length >= min_tokens, per (pair, diagonal) — exactly what the
    shingle-diagonal islands compute when max_df never caps."""
    out = set()
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = docs[a], docs[b]
            # run lengths ending at (i, j)
            run = [[0] * (len(tb) + 1) for _ in range(len(ta) + 1)]
            for i in range(1, len(ta) + 1):
                for j in range(1, len(tb) + 1):
                    if ta[i - 1] == tb[j - 1]:
                        run[i][j] = run[i - 1][j - 1] + 1
            for i in range(1, len(ta) + 1):
                for j in range(1, len(tb) + 1):
                    L = run[i][j]
                    if L < min_tokens:
                        continue
                    # maximal: not extendable forward
                    if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                        continue
                    out.add((a, b, i - L, j - L, L))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_passage_docs)
def test_duplicate_passages_matches_dp_reference(spark, rows):
    from data_pipeline_project_spark.operators.corpus import duplicate_passages

    k, min_tokens = 3, 4
    docs = {doc_id: toks for doc_id, toks in rows}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.length_tokens)
        for r in duplicate_passages(
            df, k=k, min_tokens=min_tokens, max_df=10**9
        ).collect()
    }
    assert got == _dp_spans(docs, k, min_tokens)


# ---- mixture sampling vs simulator -----------------------------------------

_mix_docs = st.lists(
    st.tuples(
        st.integers(0, 60),
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(st.sampled_from("pqrs"), min_size=0, max_size=20),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _mix_simulator(rows, budgets, n_buckets=32):
    kept = {}
    by_src = {}
    for doc_id, src, toks in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        by_src.setdefault(src, []).append((h % n_buckets, h, doc_id, len(toks)))
    for src, docs in by_src.items():
        run = 0
        for _bkt, _h, doc_id, n in sorted(docs):
            run += n
            if run <= budgets[src]:
                kept[doc_id] = (src, n, run)
    return kept


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_mix_docs, b0=st.integers(0, 40), b1=st.integers(0, 40))
def test_mixture_sample_matches_simulator(spark, rows, b0, b1):
    from data_pipeline_project_spark.operators.corpus import mixture_sample

    budgets = {"s0": b0, "s1": b1, "s2": 15}
    df = spark.createDataFrame(
        [(i, s, " ".join(t)) for i, s, t in rows],
        "doc_id long, source string, text string",
    )
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
        for r in mixture_sample(df, budgets).collect()
    }
    assert got == _mix_simulator(rows, budgets)


# ---- watermark late-flag decomposition vs sequential simulator --------------

# (arrival_key, event_time_seconds) — small domains force ties on
# arrival (broken by the tiebreak id), equal timestamps, and bursts.
_arrivals = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 5000)),
    min_size=1,
    max_size=40,
)


def _simulate_watermark(rows, delay_s):
    """Sequential truth: iterate in (arrival_key, idx) order, flag rows
    whose event time trails the running max of everything before by
    more than the delay."""
    ordered = sorted(
        ((arr, idx, ts) for idx, (arr, ts) in enumerate(rows)),
        key=lambda t: (t[0], t[1]),
    )
    out = {}
    run_max = None
    for _arr, idx, ts in ordered:
        out[idx] = run_max is not None and ts < run_max - delay_s
        run_max = ts if run_max is None else max(run_max, ts)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_arrivals, delay=st.integers(0, 600), buckets=st.integers(1, 5))
def test_watermark_flags_match_sequential_simulator(spark, rows, delay, buckets):
    """The bucketed two-phase prefix max must equal the sequential
    running-max rule for ANY arrival order, delay, and bucket count —
    including n_buckets=1 (everything in one bucket) and ties."""
    from datetime import datetime, timedelta

    from data_pipeline_project_spark.streaming.event_windows import (
        watermark_late_flags,
    )

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (idx, arr, base + timedelta(seconds=ts))
            for idx, (arr, ts) in enumerate(rows)
        ],
        "idx long, arr long, ts timestamp",
    )
    got = {
        r.idx: r.is_late
        for r in watermark_late_flags(
            df,
            ts_col="ts",
            arrival_col="arr",
            tiebreak_col="idx",
            delay_seconds=delay,
            n_buckets=buckets,
        ).collect()
    }
    assert got == _simulate_watermark(rows, delay)


# ---- funnel ordering vs sequential simulator ---------------------------------

_funnel_events = st.lists(
    st.tuples(
        st.integers(0, 8),              # user
        st.integers(0, 40),             # ts (seconds; small domain forces ties)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _simulate_funnel(rows):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((ts, et))
    counts = {"step1_view": 0, "step2_click": 0, "step3_purchase": 0}
    for evs in by_user.values():
        t1 = min((ts for ts, et in evs if et == "view"), default=None)
        if t1 is None:
            continue
        counts["step1_view"] += 1
        t2 = min((ts for ts, et in evs if et == "click" and ts > t1), default=None)
        if t2 is None:
            continue
        counts["step2_click"] += 1
        t3 = min(
            (ts for ts, et in evs if et == "purchase" and ts > t2), default=None
        )
        if t3 is not None:
            counts["step3_purchase"] += 1
    return counts


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_funnel_events)
def test_funnel_ordering_matches_simulator(spark, rows):
    """Strict temporal ordering on randomized event streams — ties
    (same-second view+click) must NOT convert, later steps before
    earlier ones must NOT count."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, base + timedelta(seconds=ts), et) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string",
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    got = {
        "step1_view": s1.count(),
        "step2_click": s2.count(),
        "step3_purchase": s3.count(),
    }
    assert got == _simulate_funnel(rows)


# ---- drop_boilerplate_lines vs a single-node simulator ----------------------

_line_alphabet = ["nav", "footer", "body", "alpha", "beta", "gamma", "x1", "y2"]
_docs_with_lines = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.lists(
            st.lists(st.sampled_from(_line_alphabet), min_size=1, max_size=3),
            min_size=1,
            max_size=5,
        ),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


def _simulate_boilerplate(rows, min_df):
    """Independent reference: line df over distinct docs, drop >= min_df."""
    df_count: dict = {}
    for _doc, lines in rows:
        for line in {" ".join(ws).strip() for ws in lines}:
            df_count[line] = df_count.get(line, 0) + 1
    boiler = {line for line, c in df_count.items() if c >= min_df}
    out = {}
    for doc, lines in rows:
        kept = [" ".join(ws).strip() for ws in lines]
        kept = [ln for ln in kept if ln not in boiler]
        out[doc] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs_with_lines, min_df=st.integers(2, 4))
def test_drop_boilerplate_lines_matches_simulator(spark, rows, min_df):
    from data_pipeline_project_spark.operators.corpus import (
        drop_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(doc, "\n".join(" ".join(ws) for ws in lines)) for doc, lines in rows],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in drop_boilerplate_lines(docs, min_df=min_df).collect()
    }
    assert got == _simulate_boilerplate(rows, min_df)


# ---- content-defined chunking invariances -----------------------------------

@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), parts=st.integers(1, 6))
def test_cdc_chunks_partitioning_invariant_and_exact_cover(spark, seed, parts):
    import random

    from data_pipeline_project_spark.operators.corpus import (
        content_defined_chunks,
    )

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 120))))
        for i in range(8)
    ]
    d1 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
    dn = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)
    a = sorted(map(tuple, content_defined_chunks(d1).collect()))
    b = sorted(map(tuple, content_defined_chunks(dn).collect()))
    assert a == b

    # exact cover: per doc, chunk token counts sum to the doc's tokens
    # and indices run 0..n-1
    per_doc: dict = {}
    for doc_id, idx, n_tok, _h in a:
        per_doc.setdefault(doc_id, []).append((idx, n_tok))
    for doc_id, text in rows:
        toks = len(text.split())
        chunks = sorted(per_doc[doc_id])
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert sum(c[1] for c in chunks) == toks
