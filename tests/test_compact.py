"""Small-file compaction (sinks/compact.py): rows are preserved
exactly, fragmented partitions shrink, healthy partitions keep their
original files untouched."""

import pytest

from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks.compact import (
    compact_dataset,
    list_data_files,
)


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_unpartitioned_compaction(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(40).write.parquet(path)
    before_rows = _rows(spark, path)
    assert len(list_data_files(spark, path)) == 40

    stats = compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)

    assert stats.partitions_compacted == 1
    assert stats.files_before == 40
    assert stats.files_after < 40
    assert not stats.atomic  # rename-swap path is flagged
    assert _rows(spark, path) == before_rows


def test_partitioned_compaction_touches_only_needy_partitions(spark, tmp_path):
    path = str(tmp_path / "parts")
    # day=A: fragmented into 30 files; day=B: already one file.
    a = spark.range(0, 5_000).select(
        F.col("id"), F.lit("A").alias("day")
    ).repartition(30)
    b = spark.range(5_000, 10_000).select(
        F.col("id"), F.lit("B").alias("day")
    ).coalesce(1)
    a.write.partitionBy("day").parquet(path)
    b.write.mode("append").partitionBy("day").parquet(path)

    before_rows = _rows(spark, path)
    b_files_before = sorted(
        fp for fp, _ in list_data_files(spark, path) if "day=B" in fp
    )
    assert len(b_files_before) == 1

    stats = compact_dataset(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_cols=["day"]
    )

    assert stats.partitions_total == 2
    assert stats.partitions_compacted == 1  # only day=A
    a_files_after = [
        fp for fp, _ in list_data_files(spark, path) if "day=A" in fp
    ]
    b_files_after = sorted(
        fp for fp, _ in list_data_files(spark, path) if "day=B" in fp
    )
    assert len(a_files_after) < 30
    assert b_files_after == b_files_before  # untouched, same physical files
    assert _rows(spark, path) == before_rows


def test_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "done")
    spark.range(0, 1_000).coalesce(1).write.parquet(path)
    files = sorted(fp for fp, _ in list_data_files(spark, path))

    stats = compact_dataset(spark, path)

    assert stats.partitions_compacted == 0
    assert stats.files_before == stats.files_after == 1
    assert sorted(fp for fp, _ in list_data_files(spark, path)) == files


def test_target_size_splits_output(spark, tmp_path):
    """A dataset larger than the target must split into multiple
    output files, not collapse to one."""
    path = str(tmp_path / "split")
    spark.range(0, 50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("pad")
    ).repartition(25).write.parquet(path)
    total = sum(sz for _, sz in list_data_files(spark, path))

    stats = compact_dataset(spark, path, target_file_bytes=total // 3)

    assert stats.files_after in (3, 4)  # ceil(bytes/target) = 3, ±rounding
    assert spark.read.parquet(path).count() == 50_000
