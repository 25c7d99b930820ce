"""Parquet-NATIVE bloom probing in candidate selection (r12).

Manifest blooms stop at _BLOOM_MAX_NDV distinct keys per file (the
2 KB filter saturates — honest scope since r11); this container's
pyarrow (16.1) and DuckDB (1.0) cannot read parquet's own bloom
filters, so sinks/parquet_bloom.py parses the footer thrift and the
split-block bloom format directly. The adversarial fixture here is
the r11 bloom fixture's HIGH-NDV variant: 8 files whose secondary-key
ranges all overlap and whose per-file distinct counts exceed the
manifest bloom cap — ranges admit all 8, the manifest has no bloom to
consult, and the parquet-native blooms cut the point delete to the
single true file. Fail-open is pinned: the same fixture written
without native blooms touches all 8 and still converges to the same
rows.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks.layout import write_bloom_filtered
from data_pipeline_project_spark.sinks.manifest import (
    _BLOOM_MAX_NDV,
    _select_candidates,
    _snapshot_zone_maps,
    delete_rows_targeted,
    merge_upsert,
    read_manifest,
    read_version,
    write_versioned_manifest,
)
from data_pipeline_project_spark.sinks.parquet_bloom import (
    parquet_bloom_might_contain,
    parquet_bloom_offsets,
    parquet_bloom_prune,
    probe_hash,
)

N_FILES = 8
PER_FILE = 4_000  # distinct sk per file — saturates the manifest bloom


def _high_ndv_table(spark, tmp_path, native_blooms: bool) -> str:
    """File i holds sk in {v : v % 8 == i} over [0, 32k): every file's
    [min, max] spans nearly the whole domain (ranges admit all), the
    per-file value SETS are disjoint, and per-file NDV = 4,000 >
    _BLOOM_MAX_NDV (manifest bloom saturates by design)."""
    assert PER_FILE > _BLOOM_MAX_NDV
    path = str(tmp_path / ("nb" if not native_blooms else "b"))
    for i in range(N_FILES):
        df = spark.range(0, N_FILES * PER_FILE).where(
            F.col("id") % N_FILES == i
        ).select(
            F.col("id").alias("sk"),
            F.lit(i).alias("src"),
        ).coalesce(1)
        if native_blooms:
            # 4x-oversized ndv -> fpp ~1e-8: the 7 decoy files are
            # deterministically rejected (at the default 1% a decoy
            # occasionally false-positives, which is fine in prod but
            # makes a == 1 assertion flaky-shaped)
            write_bloom_filtered(
                df, path, ["sk"], expected_ndv=4 * PER_FILE, mode="append"
            )
        else:
            df.write.mode("append").parquet(path)
    write_versioned_manifest(path)
    return path


def test_native_blooms_cut_point_delete_to_one_file(spark, duck, tmp_path):
    path = _high_ndv_table(spark, tmp_path, native_blooms=True)
    # manifest has NO blooms for these files (bootstrap + saturation)
    import json

    m = json.load(open(os.path.join(path, "_manifests", "latest.json")))
    assert not any(f.get("bloom") for f in m["files"])

    target = 8 * 1_000 + 3  # lives only in file 3
    cands = _candidates(spark, duck, path, target)
    assert len(cands) == 1, cands  # ranges admit 8; native blooms cut to 1
    before = read_version(spark, path).count()
    res = delete_rows_targeted(
        spark, duck, path, "sk",
        spark.createDataFrame([(target,)], "sk long"), commit=True,
    )
    assert res["rows_deleted"] == 1
    assert res["files_rewritten"] == 1, res
    assert read_version(spark, path).count() == before - 1
    assert (
        read_version(spark, path).where(F.col("sk") == target).count() == 0
    )


def test_fail_open_without_native_blooms_still_correct(
    spark, duck, tmp_path
):
    path = _high_ndv_table(spark, tmp_path, native_blooms=False)
    target = 8 * 1_000 + 3
    cands = _candidates(spark, duck, path, target)
    assert len(cands) == N_FILES, cands  # ranges alone: every file probed
    before = read_version(spark, path).count()
    res = delete_rows_targeted(
        spark, duck, path, "sk",
        spark.createDataFrame([(target,)], "sk long"), commit=True,
    )
    assert res["rows_deleted"] == 1
    assert res["files_rewritten"] == 1, res  # only the true file matched
    assert read_version(spark, path).count() == before - 1


def _candidates(spark, duck, path, target):
    """The probe set a point op would read — the r12 observable."""
    import os as _os

    head = read_manifest(
        _os.path.join(path, "_manifests", "latest.json")
    )
    zone_maps, _rels, blooms = _snapshot_zone_maps(
        duck, head, "sk", "BIGINT"
    )
    return _select_candidates(
        spark, zone_maps,
        spark.createDataFrame([(target,)], "sk long"),
        "sk", "driver", blooms=blooms,
    )


def test_native_blooms_prune_merge_candidates(spark, duck, tmp_path):
    path = _high_ndv_table(spark, tmp_path, native_blooms=True)
    target = 8 * 2_000 + 5  # file 5
    cands = _candidates(spark, duck, path, target)
    assert len(cands) == 1, cands
    res = merge_upsert(
        spark, duck, path, "sk",
        spark.createDataFrame([(target, -1)], "sk long, src long"),
    )
    assert res["files_rewritten"] == 1, res
    got = read_version(spark, path).where(F.col("sk") == target).collect()
    assert [r.src for r in got] == [-1]


def test_no_false_negatives_randomized_against_sparks_writer(
    spark, tmp_path
):
    """The format-parity property: every value parquet-mr inserted
    must pass this reader's probe — across both supported physical
    types, random draws."""
    rng = random.Random(31)
    path = str(tmp_path / "t")
    longs = [rng.randrange(-(2**60), 2**60) for _ in range(1_500)]
    strs = [
        "".join(rng.choice("abcXYZ019 _-é中") for _ in range(rng.randrange(1, 30)))
        for _ in range(1_500)
    ]
    df = spark.createDataFrame(
        list(zip(longs, strs)), "k long, s string"
    ).coalesce(1)
    write_bloom_filtered(df, path, ["k", "s"], expected_ndv=2_000)
    f = [
        os.path.join(path, x)
        for x in os.listdir(path)
        if x.endswith(".parquet")
    ][0]
    offs = parquet_bloom_offsets(f)
    assert {c["path"] for c in offs} == {"k", "s"}
    for v in rng.sample(longs, 100):
        assert parquet_bloom_might_contain(f, "k", [v]), v
    for v in rng.sample(strs, 100):
        assert parquet_bloom_might_contain(f, "s", [v]), v
    # absent keys mostly rejected (FPR sanity, not a contract)
    fp = sum(
        1
        for i in range(300)
        if parquet_bloom_might_contain(f, "k", [2**61 + i])
    )
    assert fp <= 30, fp
    # prune keeps exactly the true file when given decoys
    assert parquet_bloom_prune([f], "k", [longs[0]]) == [f]
    assert parquet_bloom_prune([f], "k", [2**61 + 12345]) == []


def test_reader_fails_open_on_garbage(tmp_path):
    p = str(tmp_path / "x.parquet")
    with open(p, "wb") as fh:
        fh.write(b"this is not parquet at all" * 10)
    assert parquet_bloom_offsets(p) == []
    assert parquet_bloom_might_contain(p, "k", [1]) is True
    assert parquet_bloom_prune([p], "k", [1]) == [p]
    assert probe_hash(object(), 2) is None  # unencodable: fail open
