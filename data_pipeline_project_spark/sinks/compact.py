"""Small-file compaction for parquet datasets — table maintenance at
100 TB scale.

Long-running ingest (streaming micro-batches, frequent incremental
appends) fragments a dataset into thousands of KB-sized files; every
downstream scan then pays per-file open/footer costs and the driver
pays listing + task-scheduling overhead (a 100 TB table at 1 MB/file
is 10^8 tasks). Compaction rewrites fragmented data into files near a
target size, per partition, touching ONLY partitions that need it:

1. list the data files once (Hadoop FileSystem API — works on HDFS /
   S3A / local alike) and group by Hive partition directory;
2. select partitions where files could be merged (more than one file
   and average file size below a threshold, default half the target);
3. read just those partitions (partition-pruned scan), rewrite them
   sized by ``maxRecordsPerFile`` derived from the measured bytes/row,
   and swap them in with dynamic partition overwrite — untouched
   partitions keep their original files byte-for-byte.

Unpartitioned datasets are rewritten wholesale through a temp
directory + rename swap (flagged non-atomic in the stats; on object
stores run it inside the table lock your orchestrator provides).

Reference scope note: the reference has no table maintenance (its
sink is MySQL, `pipeline.py:211-261`); this belongs to the 100 TB
extension surface (BASELINE.json).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_SKIP_PREFIXES = ("_", ".")


@dataclass
class CompactionStats:
    partitions_total: int
    partitions_compacted: int
    files_before: int
    files_after: int
    bytes_compacted: int
    atomic: bool


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """All data files under ``path`` as (path, size), skipping metadata
    files (_SUCCESS, hidden). One recursive listing call — on S3A this
    is the bulk-list API, not a per-directory walk."""
    fs, hpath = _fs_and_path(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(_SKIP_PREFIXES):
            continue
        out.append((st.getPath().toString(), st.getLen()))
    return out


def _partition_dir(file_path: str, base: str) -> str:
    """Hive partition subdirectory of a file relative to the dataset
    root ('' for unpartitioned layouts)."""
    rel = file_path[len(base):].lstrip("/")
    return rel.rsplit("/", 1)[0] if "/" in rel else ""


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    small_file_threshold: int | None = None,
) -> CompactionStats:
    """Compact the parquet dataset at ``path`` (see module docstring).

    ``partition_cols`` names the Hive partition columns if the dataset
    is partitioned (their values are re-derived from directory names by
    Spark's reader). ``small_file_threshold`` (default
    ``target_file_bytes // 2``): a partition is compacted only when it
    has >1 file and its mean file size is below this.
    """
    if small_file_threshold is None:
        small_file_threshold = target_file_bytes // 2

    fs, hpath = _fs_and_path(spark, path)
    base = fs.getFileStatus(hpath).getPath().toString()  # qualified URI
    files = list_data_files(spark, base)

    by_part: dict[str, list[tuple[str, int]]] = {}
    for fp, sz in files:
        by_part.setdefault(_partition_dir(fp, base), []).append((fp, sz))

    needy = {
        part: flist
        for part, flist in by_part.items()
        if len(flist) > 1
        and sum(sz for _, sz in flist) / len(flist) < small_file_threshold
    }
    files_before = sum(len(v) for v in by_part.values())
    if not needy:
        return CompactionStats(
            len(by_part), 0, files_before, files_before, 0, True
        )

    bytes_compacted = sum(sz for v in needy.values() for _, sz in v)

    if partition_cols:
        # Partition-pruned read of only the needy partitions, then
        # dynamic-overwrite them in place. basePath keeps the partition
        # columns derived from directory names.
        reader = spark.read.option("basePath", base)
        needy_paths = [f"{base}/{part}" for part in needy]
        df = reader.parquet(*needy_paths)
        rows = df.count()
        max_records = max(
            1, int(rows * target_file_bytes / max(bytes_compacted, 1))
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            (
                # One writer task per partition value; maxRecordsPerFile
                # re-splits oversized partitions. (A skewed partition
                # serializes through one task — at cluster scale add a
                # salt column to partitionBy-adjacent repartitioning if
                # single partitions exceed tens of GB.)
                df.repartition(*[F.col(c) for c in partition_cols])
                .write.mode("overwrite")
                .partitionBy(*partition_cols)
                .option("maxRecordsPerFile", max_records)
                .parquet(base)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # Dynamic partition overwrite commits per-partition: a failure
        # mid-commit can leave some partitions rewritten and others not
        # (each partition is individually consistent). Only a
        # single-partition rewrite is atomic as a whole.
        atomic = len(needy) <= 1
    else:
        # Whole-dataset rewrite through a temp dir + rename swap.
        df = spark.read.parquet(base)
        rows = df.count()
        n_files = max(1, math.ceil(bytes_compacted / target_file_bytes))
        max_records = max(1, math.ceil(rows / n_files))
        tmp = base.rstrip("/") + "__compact_tmp"
        (
            df.repartition(n_files)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records)
            .parquet(tmp)
        )
        # Crash-safe swap ordering: park the live data aside, promote the
        # rewrite, then drop the parked copy. Every crash point leaves a
        # complete dataset on disk (at base, or recoverable at
        # base__compact_old) — never a window where both are gone.
        jvm = spark._jvm
        old = jvm.org.apache.hadoop.fs.Path(base.rstrip("/") + "__compact_old")
        fs.delete(old, True)  # leftover from a previously crashed swap
        fs.rename(hpath, old)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)
        fs.delete(old, True)
        atomic = False

    files_after = len(list_data_files(spark, base))
    return CompactionStats(
        partitions_total=len(by_part),
        partitions_compacted=len(needy),
        files_before=files_before,
        files_after=files_after,
        bytes_compacted=bytes_compacted,
        atomic=atomic,
    )
