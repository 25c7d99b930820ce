"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Why this exists: the manifest log's NDV sketches and per-file Bloom
filters persist HASH OUTPUTS on disk (HLL registers, bloom bit
positions). r11 computed those with DuckDB's internal ``hash()``,
which is not a stable on-disk contract across engine versions — a
DuckDB upgrade that changes ``hash()`` would make probe hashes
disagree with stored bits, producing bloom FALSE NEGATIVES (silently
skipped files on merge/delete) and invalid merged NDV estimates
(r11 ADVICE). r12 pins ONE spec-stable family everywhere instead:

- **build side** (executors): Spark's builtin ``F.xxhash64(col)`` —
  XXH64, seed 42, JVM-side, whole-stage codegen;
- **probe / oracle side** (driver, tests): this module — the same
  XXH64 spec over the same canonical encodings, so a Python value can
  be hashed to probe a bloom without a JVM round-trip.

Canonical encodings mirror Spark's ``HashExpression`` semantics:
LongType hashes the 8-byte little-endian value, IntegerType the
4-byte value, StringType the UTF-8 bytes, DoubleType the IEEE bits
(with -0.0 normalized to 0.0), DateType the epoch-day int32,
TimestampType the epoch-micros int64. The sketch layer casts every
column to one of these canonical types before hashing (int-ish →
long, float-ish → double), so only those paths are needed here.

Every entry that persists hashes carries the family stamp
``HASH_FAMILY`` ("xxh64-spark-v1"); readers fail open on mismatch.

XXH64 spec: Yann Collet, xxHash (BSD). Spark reference:
``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``common/sketch XXH64`` (seed 42). Verified bit-for-bit against
``F.xxhash64`` in tests/test_xxh64_parity.py.
"""

from __future__ import annotations

import struct

HASH_FAMILY = "xxh64-spark-v1"
SPARK_SEED = 42

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """== F.xxhash64(col.cast('long')) for non-null v (signed)."""
    return _signed(xxh64(struct.pack("<q", v), seed))


def spark_xxhash64_int(v: int, seed: int = SPARK_SEED) -> int:
    """== F.xxhash64(col) for IntegerType/DateType (4-byte path)."""
    return _signed(xxh64(struct.pack("<i", v), seed))


def spark_xxhash64_str(v: str, seed: int = SPARK_SEED) -> int:
    """== F.xxhash64(col.cast('string')) for non-null v (signed)."""
    return _signed(xxh64(v.encode("utf-8"), seed))


def spark_xxhash64_double(v: float, seed: int = SPARK_SEED) -> int:
    """== F.xxhash64(col.cast('double')): IEEE bits, -0.0 -> 0.0."""
    if v == 0.0:
        v = 0.0  # normalizes -0.0 exactly like Spark's hash path
    bits = struct.unpack("<q", struct.pack("<d", v))[0]
    return _signed(xxh64(struct.pack("<q", bits), seed))


def spark_xxhash64_bool(v: bool, seed: int = SPARK_SEED) -> int:
    """The sketch layer casts booleans to long before hashing."""
    return spark_xxhash64_long(1 if v else 0, seed)
