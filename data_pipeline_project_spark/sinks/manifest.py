"""Snapshot manifests: pin the EXACT file set of a corpus version.

The reproducibility problem at 100 TB: `spark.read.parquet(dir)` reads
whatever is in the directory at job start — a concurrently-appending
ingest makes two "identical" training runs read different corpora, and
nobody can say which files trained a given model. A manifest is the
poor-engine's table format (what Iceberg/Delta snapshots do): an
atomically-written JSON listing each data file with its size and row
count, so a reader scans exactly that snapshot no matter what has been
appended since, and an auditor can verify the files are still the ones
trained on.

Scale notes: the manifest is file-count-sized (KBs per thousand
files); writing it is one driver-side listing + parquet-footer reads
(metadata only, no data I/O); reading via manifest passes the explicit
file list to the reader, which also skips the directory listing — at
cloud-storage scale the listing itself is a cost.

No reference counterpart (the reference's unit of state is one CSV
file moved to processed/ — `pipeline.py:323-324`); this is that idea's
table-level twin.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def write_manifest(path: str, manifest_path: str | None = None) -> dict:
    """Snapshot the parquet dataset at ``path``: per file, byte size and
    footer row count (metadata read only). Written atomically
    (tmp + rename) so a concurrent reader sees the old or the new
    manifest, never a torn one. Returns the manifest dict."""
    import pyarrow.parquet as pq

    files = []
    total_rows = 0
    for f in _data_files(path):
        md = pq.read_metadata(f)
        total_rows += md.num_rows
        files.append(
            {
                "path": os.path.relpath(f, path),
                "bytes": os.path.getsize(f),
                "rows": md.num_rows,
            }
        )
    manifest = {
        "root": os.path.abspath(path),
        "n_files": len(files),
        "total_rows": total_rows,
        "files": files,
    }
    target = manifest_path or os.path.join(path, "_manifest.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, target)
    return manifest


def read_manifest(manifest_path: str) -> dict:
    with open(manifest_path) as fh:
        return json.load(fh)


def read_snapshot(spark, manifest: dict | str) -> DataFrame:
    """Read EXACTLY the files a manifest pins — appends since the
    snapshot are invisible, and a missing file fails loudly (the
    snapshot is unreproducible; silently reading the remainder would
    be a lie)."""
    if isinstance(manifest, str):
        manifest = read_manifest(manifest)
    root = manifest["root"]
    files = [os.path.join(root, f["path"]) for f in manifest["files"]]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"snapshot unreproducible: {len(missing)} manifest file(s) "
            f"gone, e.g. {missing[:3]}"
        )
    return spark.read.parquet(*files)


def verify_snapshot(manifest: dict | str) -> list[str]:
    """Audit a snapshot without Spark: list every divergence between
    the manifest and the files on disk (missing file, size drift).
    Empty list == the training inputs are still byte-intact."""
    if isinstance(manifest, str):
        manifest = read_manifest(manifest)
    problems = []
    root = manifest["root"]
    for entry in manifest["files"]:
        f = os.path.join(root, entry["path"])
        if not os.path.exists(f):
            problems.append(f"missing: {entry['path']}")
        elif os.path.getsize(f) != entry["bytes"]:
            problems.append(
                f"size drift: {entry['path']} "
                f"{os.path.getsize(f)} != {entry['bytes']}"
            )
    return problems
