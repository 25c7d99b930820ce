"""The pinned sketch hash family (r12, r11 ADVICE fix).

NDV registers and bloom bits persist HASH OUTPUTS in the manifest
log, so the hash must be a spec-stable on-disk contract. The family
is XXH64/seed-42 == Spark's builtin ``F.xxhash64`` — built executor-
side by Spark, probed driver-side by the pure-Python twin in
functions/xxh64.py. These tests pin:

1. bit-for-bit parity between the Python twin and F.xxhash64 across
   every canonical encoding the sketch layer uses (randomized);
2. full sketch-content parity: a committed entry's registers, top-K,
   non-null counts and bloom bits equal an INDEPENDENT pure-Python
   recompute from the parquet bytes (pyarrow read + the Python twin)
   — two implementations, one spec;
3. fail-open on foreign family stamps: legacy (r11 DuckDB-hash)
   sketches never merge into NDV estimates and never prune a file.
"""

from __future__ import annotations

import datetime
import os
import random

from pyspark.sql import functions as F

from data_pipeline_project_spark.functions.xxh64 import (
    HASH_FAMILY,
    spark_xxhash64_double,
    spark_xxhash64_int,
    spark_xxhash64_long,
    spark_xxhash64_str,
)
from data_pipeline_project_spark.sinks import manifest as M
from data_pipeline_project_spark.sinks.manifest import (
    _bloom_may_contain_any,
    _bloom_positions,
    append_snapshot,
    hll_estimate,
    read_manifest,
    table_column_ndv,
    write_versioned_manifest,
)


def _latest(path):
    return read_manifest(os.path.join(path, "_manifests", "latest.json"))


def test_python_twin_matches_spark_xxhash64_randomized(spark):
    rng = random.Random(99)
    longs = [0, -1, 1, 2**62, -(2**62)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(40)
    ]
    strs = ["", "a", "héllo 中文 🙂"] + [
        "".join(rng.choice("abcXYZ019 _-é中") for _ in range(rng.randrange(0, 60)))
        for _ in range(40)
    ]
    dbls = [0.0, -0.0, 1.5, -1e300, 3.141592653589793] + [
        rng.uniform(-1e12, 1e12) for _ in range(20)
    ]
    dates = [datetime.date(1970, 1, 1) + datetime.timedelta(days=d)
             for d in (0, -400, 20_000, 999)]
    df = spark.createDataFrame(
        [(v,) for v in longs], "x long"
    ).select(F.xxhash64("x").alias("h"))
    assert [r.h for r in df.collect()] == [
        spark_xxhash64_long(v) for v in longs
    ]
    df = spark.createDataFrame(
        [(v,) for v in strs], "x string"
    ).select(F.xxhash64("x").alias("h"))
    assert [r.h for r in df.collect()] == [
        spark_xxhash64_str(v) for v in strs
    ]
    df = spark.createDataFrame(
        [(v,) for v in dbls], "x double"
    ).select(F.xxhash64("x").alias("h"))
    assert [r.h for r in df.collect()] == [
        spark_xxhash64_double(v) for v in dbls
    ]
    df = spark.createDataFrame(
        [(v,) for v in dates], "x date"
    ).select(F.xxhash64("x").alias("h"))
    assert [r.h for r in df.collect()] == [
        spark_xxhash64_int((v - datetime.date(1970, 1, 1)).days)
        for v in dates
    ]


def _py_sketch(pa_table, col, kind):
    """Independent pure-Python recompute of one column's sketch —
    pyarrow read + the Python XXH64 twin; mirrors the documented spec
    (reg = unsigned(h) & 127, rho = tz(h >> 7) + 1, 58 when 0;
    top-K ties: count desc, string form asc)."""
    vals = [v for v in pa_table.column(col).to_pylist() if v is not None]
    hs = []
    for v in vals:
        if kind == "int":
            hs.append(spark_xxhash64_long(int(v)))
        elif kind == "str":
            hs.append(spark_xxhash64_str(str(v)))
        elif kind == "float":
            hs.append(spark_xxhash64_double(float(v)))
        else:
            raise AssertionError(kind)
    regs = [0] * 128
    for h in hs:
        u = h & ((1 << 64) - 1)
        reg, rest = u & 127, u >> 7
        rho = 58 if rest == 0 else ((rest & -rest).bit_length())
        if rho > regs[reg]:
            regs[reg] = rho
    counts: dict = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:4]
    return {
        "regs": regs,
        "top": [[v, n] for v, n in top],
        "nn": len(vals),
        "hashes": set(hs),
    }


def test_committed_sketch_matches_pure_python_oracle(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(0).alias("v")
    ).coalesce(1).write.parquet(path)
    write_versioned_manifest(path)
    append_snapshot(
        spark, path,
        spark.range(1_000, 1_800).select(
            F.col("id").alias("k"),
            (F.col("id") % 13).alias("v"),
        ).coalesce(1),
        key_col="k",
    )
    m = _latest(path)
    entry = next(f for f in m["files"] if f.get("ndv"))
    pa_table = pq.read_table(os.path.join(path, entry["path"]))

    for col, kind in (("k", "int"), ("v", "int")):
        want = _py_sketch(pa_table, col, kind)
        got = entry["ndv"][col]
        assert got["h"] == HASH_FAMILY
        assert got["regs"] == want["regs"], col
        assert got["top"] == want["top"], col
        assert got["nn"] == want["nn"], col

    # bloom bits: exactly the union of the present keys' positions
    bloom = entry["bloom"]["k"]
    assert bloom["h"] == HASH_FAMILY and bloom["kind"] == "int"
    import base64

    bits = bytearray(M._BLOOM_M_BITS // 8)
    for h in _py_sketch(pa_table, "k", "int")["hashes"]:
        for p in _bloom_positions(h, M._BLOOM_M_BITS):
            bits[p >> 3] |= 1 << (p & 7)
    assert base64.b64decode(bloom["b64"]) == bytes(bits)


def test_foreign_family_sketch_fails_open(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 500).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).coalesce(1).write.parquet(path)
    write_versioned_manifest(path)
    append_snapshot(
        spark, path,
        spark.range(1_000, 1_200).select(
            F.col("id").alias("k"), F.lit(2).alias("v")
        ).coalesce(1),
        key_col="k",
    )
    mpath = os.path.join(path, "_manifests", "latest.json")
    m = _latest(path)
    entry = next(f for f in m["files"] if f.get("ndv"))

    # simulate a legacy r11 sketch: same shape, no/foreign stamp
    for sk in entry["ndv"].values():
        sk["h"] = "duckdb-hash-legacy"
    legacy_bloom = dict(entry["bloom"]["k"], h="duckdb-hash-legacy")

    # NDV merge: the foreign-family entry reads as uncovered
    import json

    with open(mpath) as fh:
        raw = json.load(fh)
    for f in raw["files"]:
        if f.get("ndv"):
            for sk in f["ndv"].values():
                sk["h"] = "duckdb-hash-legacy"
    with open(mpath, "w") as fh:
        json.dump(raw, fh)
    got = table_column_ndv(path, "k")
    assert got is None or got["coverage"] < 1.0

    # bloom probe: foreign stamp keeps the file a candidate even for
    # keys that are genuinely absent (fail open, never false-negative)
    assert _bloom_may_contain_any(legacy_bloom, [12345, -99]) is True


def test_hll_estimate_unchanged_contract():
    regs = [0] * 128
    for i in (3, 17, 40, 99):
        regs[i] = 5
    assert abs(hll_estimate(regs) - 4) <= 1
