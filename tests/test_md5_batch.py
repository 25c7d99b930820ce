"""functions/md5_batch — the r14 batched-md5 helpers behind the dedup/
corpus Arrow kernels. The digest contract is oracle-load-bearing
(int(md5(utf8).hexdigest()[:15], 16)), so every path — DuckDB
vectorized, small-batch hashlib shortcut, slice gather — must agree
with hashlib bit-for-bit."""

import hashlib
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from data_pipeline_project_spark.functions import md5_batch  # noqa: E402


def _ref60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


EDGE = [
    "",
    "a",
    "hello world",
    "x" * 200,
    "ümlaut STRAßE İstanbul K kelvin",  # multi-byte utf-8
    "tab\tand\nnewline",
    "0" * 55,  # exactly one md5 block after padding
    "0" * 56,  # first length that needs a second block
    "y" * 119,
    "y" * 120,
]


def test_prefix60_strings_small_batch_matches_hashlib():
    # below _SMALL_BATCH => hashlib loop path
    got = md5_batch.md5_prefix60_strings(EDGE)
    assert got.dtype == np.int64
    assert got.tolist() == [_ref60(s) for s in EDGE]


def test_prefix60_strings_large_batch_matches_hashlib():
    strings = [f"value-{i}-{'p' * (i % 37)}" for i in range(md5_batch._SMALL_BATCH + 500)]
    got = md5_batch.md5_prefix60_strings(strings)
    assert got.tolist() == [_ref60(s) for s in strings]


def test_prefix60_slices_both_paths_match_hashlib():
    # build a shared ascii buffer with overlapping slices
    base = b"the quick brown fox jumps over the lazy dog 0123456789 " * 300
    buf = np.frombuffer(base, dtype=np.uint8)
    rng = np.random.RandomState(7)
    for n in (50, md5_batch._SMALL_BATCH + 100):  # hashlib path, duck path
        starts = rng.randint(0, len(base) - 64, size=n).astype(np.int64)
        lens = rng.randint(0, 64, size=n).astype(np.int64)  # incl. empty
        got = md5_batch.md5_prefix60_slices(buf, starts, lens)
        want = [
            int(hashlib.md5(base[s : s + ln]).hexdigest()[:15], 16)
            for s, ln in zip(starts.tolist(), lens.tolist())
        ]
        assert got.tolist() == want


def test_md5_hex_strings_matches_hashlib():
    big = [f"doc {i} body" for i in range(md5_batch._SMALL_BATCH + 10)]
    for strings in (EDGE, big):  # small + large paths
        got = md5_batch.md5_hex_strings(strings)
        assert got == [hashlib.md5(s.encode()).hexdigest() for s in strings]


def test_hashlib_fallback_env_knob(monkeypatch):
    # the opt-out knob must force the loop path and still agree
    monkeypatch.setenv("SPARK_GRAFT_MD5_IMPL", "hashlib")
    monkeypatch.setattr(md5_batch, "_DUCK", None)
    monkeypatch.setattr(md5_batch, "_DUCK_FAILED", False)
    strings = [f"k{i}" for i in range(md5_batch._SMALL_BATCH + 5)]
    got = md5_batch.md5_prefix60_strings(strings)
    assert got.tolist() == [_ref60(s) for s in strings]
    assert md5_batch._DUCK is None  # duckdb never engaged
    # restore lazy init for later tests in this process
    monkeypatch.setattr(md5_batch, "_DUCK_FAILED", False)


def test_empty_inputs():
    assert md5_batch.md5_prefix60_strings([]).size == 0
    assert md5_batch.md5_hex_strings([]) == []
    buf = np.frombuffer(b"abc", dtype=np.uint8)
    assert md5_batch.md5_prefix60_slices(
        buf, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ).size == 0


@pytest.mark.parametrize("n", [3, 6])
def test_batch_shingle_hashes_matches_per_row_form(n):
    import re

    import pyarrow.parquet as pq

    from data_pipeline_project_spark.operators.dedup import (
        _batch_shingle_hashes,
    )

    pat = re.compile("[^a-z0-9]+")
    texts = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet")
        .column("text")
        .to_pylist()
    )
    texts = ["", None, "one two", "a b c d e f g h"] + texts
    counts, flat = _batch_shingle_hashes(texts, n, pat)
    assert int(counts.sum()) == len(flat)
    pos = 0
    for t, c in zip(texts, counts.tolist()):
        toks = [x for x in pat.split(t.lower()) if x] if t else []
        want = [
            _ref60(" ".join(toks[i : i + n]))
            for i in range(max(len(toks) - (n - 1), 0))
        ]
        assert flat[pos : pos + c].tolist() == want
        pos += c
