"""Streaming change-data-feed source over manifest tables (Spark 4
Python DataSource API): ``spark.readStream.format("tablechanges")``.

Delta's "table as a stream of changes" surface for the repo's manifest
lakehouse: every committed snapshot version becomes one micro-batch
step whose rows are the row-level changes of that commit, tagged
``_change_type`` ('insert' / 'delete' — an update under copy-on-write
MERGE is delete(old)+insert(new), the same convention as the batch
``snapshot_changes``) and ``_commit_version``. Consumers get exactly
the feed ``streaming/cdc_apply.py`` PRODUCES, closing the loop: one
manifest table can now drive another through plain structured
streaming.

Semantics and scale:

- **Offsets are snapshot versions** (``{"version": N}``); the
  checkpoint therefore survives restarts, and a replayed batch
  recomputes its diff from the SAME two manifests and the SAME pinned
  files — deterministic as long as tombstones live (vacuum of a
  not-yet-consumed version breaks replay LOUDLY, the same contract as
  batch time travel).
- **One partition per version step**; each step reads only the two
  versions' NON-SHARED files (identical shared files cannot contribute
  changes), so a step costs O(that commit's churn), never O(table).
- The per-step diff runs worker-side on pyarrow + pandas (a DataSource
  ``read`` has no SparkSession): a multiset groupby-count subtract,
  honest about duplicate-row cardinality exactly like ``exceptAll``.
- ``starting_version`` option (default 0) controls history: 0 streams
  the table's full content as version-1 inserts first; N>0 starts
  after version N.

The batch reader is the same feed over a closed version range
(``spark.read.format("tablechanges")`` with ``from_version`` /
``to_version``), sharing the partition-per-step planner.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_META_COLS = "_change_type STRING, _commit_version BIGINT"

# arrow type name -> spark DDL type, for driver-side schema inference
# from the latest snapshot's parquet footer. Exotic types must be
# supplied explicitly via option("table_schema").
_ARROW_TO_DDL = {
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INT",
    "int64": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
    "large_string": "STRING",
    "bool": "BOOLEAN",
    "date32[day]": "DATE",
    "timestamp[us]": "TIMESTAMP_NTZ",
    "timestamp[ns]": "TIMESTAMP_NTZ",
    "timestamp[ms]": "TIMESTAMP_NTZ",
}


def _hive_parts(rel: str) -> dict:
    """{col: raw value} from a relpath's k=v directory segments."""
    out = {}
    for seg in rel.replace("\\", "/").split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


def _hive_cast(v: str):
    """Match Spark's partition-value inference for the layouts this
    repo writes: all-digit -> int (Spark: IntegerType), ISO date ->
    date, else string. A table_schema option must declare partition
    columns with these same types."""
    import datetime

    if v.lstrip("-").isdigit():
        return int(v)
    try:
        return datetime.date.fromisoformat(v)
    except ValueError:
        return v


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "_manifests", f"v{version}.json")


def _load_manifest(root: str, version: int) -> dict:
    p = _manifest_path(root, version)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"tablechanges: snapshot v{version} missing under {root} "
            "(never committed, or dropped by vacuum before the stream "
            "consumed it)"
        )
    with open(p) as fh:
        return json.load(fh)


def _resolve(root: str, rel: str) -> str:
    primary = os.path.join(root, rel)
    if os.path.exists(primary):
        return primary
    tomb = os.path.join(root, "_removed", rel)
    if os.path.exists(tomb):
        return tomb
    raise FileNotFoundError(
        f"tablechanges: pinned file {rel} unresolvable (vacuumed before "
        "the stream consumed its version)"
    )


def _latest_version(root: str) -> int:
    mdir = os.path.join(root, "_manifests")
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    ]
    return max(versions) if versions else 0


class _StepPartition(InputPartition):
    def __init__(self, root: str, version: int, shard: int = 0, n_shards: int = 1):
        self.root = root
        self.version = version  # the commit this step emits (v-1 -> v)
        self.shard = shard
        self.n_shards = n_shards


def _py(v):
    """numpy scalar -> python native (the DataSource row path converts
    per-field; numpy int64/float64 must not leak through). pandas
    Timestamp IS a datetime subclass and passes as-is; NaT -> None.
    NaN -> None: pandas groupby(dropna=False) normalizes EVERY na
    flavor in its group keys to float NaN — including a null in a
    BIGINT column (object dtype with None) — and a float NaN cannot
    re-enter an int64 arrow column. Mapping back to None restores the
    parquet null; the cost is that a genuine float-NaN value is also
    reported as null in the feed (pandas already conflates the two on
    read, so the distinction was gone before this line)."""
    import pandas as pd

    if v is pd.NaT:
        return None
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float) and v != v:
        return None
    return v


def _step_rows(
    root: str, version: int, columns: list[str], shard: int = 0, n_shards: int = 1
):
    """Yield this commit's change rows: the multiset diff of version-1
    vs version over their non-shared files (version 1 diffs against the
    empty table).

    ``n_shards > 1`` splits one commit's diff across tasks: a multiset
    diff decomposes exactly under ANY deterministic row partitioning
    (diff(A,B) = union over shards of diff(A_s, B_s)), so each task
    keeps only rows whose stable row hash lands in its shard. The trade
    is read amplification (every shard re-reads the step's non-shared
    files) for parallel CPU on the groupby — worth it precisely for
    bulk-rewrite commits whose footprint is the whole table."""
    import pandas as pd
    import pyarrow.parquet as pq

    from data_pipeline_project_spark.sinks.manifest import (
        _dv_positions_by_file,
    )

    new_m = _load_manifest(root, version)
    new_files = {f["path"] for f in new_m["files"]}
    if version == 1:
        old_m, old_files = {}, set()
    else:
        old_m = _load_manifest(root, version - 1)
        old_files = {f["path"] for f in old_m["files"]}
    shared = new_files & old_files
    # deletion vectors: per-version dead positions; a path-shared file
    # whose dead set changed between the versions must enter the diff
    old_pos = _dv_positions_by_file(root, old_m.get("dv"))
    new_pos = _dv_positions_by_file(root, new_m.get("dv"))
    if (old_m.get("dv") or []) != (new_m.get("dv") or []):
        shared = {
            rel
            for rel in shared
            if old_pos.get(rel, set()) == new_pos.get(rel, set())
        }
    # pending renames (schema evolution): files carry physical names, a
    # file has exactly one of {old, new}, so a per-file rename restores
    # the logical column before the diff
    ren = new_m.get("renames") or {}

    def _one(rel, dead_by_file):
        # integer_object_nulls: a nullable int column must not get
        # float64-ified (5 -> 5.0 would corrupt BIGINT fields)
        df = pq.read_table(_resolve(root, rel)).to_pandas(
            integer_object_nulls=True
        )
        # DV identity is the manifest's relpath (see _dv_filter) — a
        # basename lookup would collide across partition directories
        dead = dead_by_file.get(rel)
        if dead:
            # to_pandas preserves file row order: index == row_index
            df = df.drop(index=[i for i in dead if i < len(df)])
        # hive partition columns live in the directory name, not the
        # file — surface them like a basePath read would
        for k, v in _hive_parts(rel).items():
            if k not in df.columns:
                df[k] = _hive_cast(v)
        return df.rename(columns=ren)

    def _frame(rels, dead_by_file):
        frames = [_one(r, dead_by_file) for r in sorted(rels)]
        if not frames:
            return None
        df = pd.concat(frames, ignore_index=True)
        for c in columns:
            # schema evolution: files written before a column existed
            # lack it — surface nulls, same as the pinned-schema read
            if c not in df.columns:
                df[c] = None
        df = df[columns]
        if n_shards > 1:
            # stable across processes: fixed-algorithm row hash
            h = pd.util.hash_pandas_object(df, index=False)
            df = df[(h % n_shards) == shard]
        return df if len(df) else None

    new_df = _frame(new_files - shared, new_pos)
    old_df = _frame(old_files - shared, old_pos)

    def _emit(df, change_type):
        for row in df.itertuples(index=False):
            yield (*[_py(v) for v in row], change_type, version)

    if new_df is None and old_df is None:
        return
    if old_df is None:
        yield from _emit(new_df, "insert")
        return
    if new_df is None:
        yield from _emit(old_df, "delete")
        return
    # multiset diff: per-distinct-row counts, honest about duplicates
    # (exceptAll semantics). dropna=False keeps NULL-carrying rows.
    n = new_df.groupby(columns, dropna=False, sort=False).size()
    o = old_df.groupby(columns, dropna=False, sort=False).size()
    diff = n.sub(o, fill_value=0).astype(int)
    for key, cnt in diff.items():
        if cnt == 0:
            continue
        row = key if isinstance(key, tuple) else (key,)
        ct = "insert" if cnt > 0 else "delete"
        out = (*[_py(v) for v in row], ct, version)
        for _ in range(abs(int(cnt))):
            yield out


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, columns: list[str]):
        self.root = options["path"]
        self.columns = columns
        self.starting = int(options.get("starting_version", 0))
        self.shards = int(options.get("shards", 1))

    def initialOffset(self):
        return {"version": self.starting}

    def latestOffset(self):
        # everything committed so far — availableNow derives its drain
        # target from ONE call, so report the real latest, and never go
        # backwards if the option asked to skip history
        return {"version": max(_latest_version(self.root), self.starting)}

    def partitions(self, start, end):
        return [
            _StepPartition(self.root, v, s, self.shards)
            for v in range(start["version"] + 1, end["version"] + 1)
            for s in range(self.shards)
        ]

    def read(self, partition):
        yield from _step_rows(
            partition.root, partition.version, self.columns,
            partition.shard, partition.n_shards,
        )

    def commit(self, end):
        pass


class TableChangesBatchReader(DataSourceReader):
    def __init__(self, options, columns: list[str]):
        self.root = options["path"]
        self.columns = columns
        self.v_from = int(options.get("from_version", 0))
        to = options.get("to_version")
        self.v_to = int(to) if to is not None else _latest_version(self.root)
        self.shards = int(options.get("shards", 1))

    def partitions(self):
        return [
            _StepPartition(self.root, v, s, self.shards)
            for v in range(self.v_from + 1, self.v_to + 1)
            for s in range(self.shards)
        ]

    def read(self, partition):
        yield from _step_rows(
            partition.root, partition.version, self.columns,
            partition.shard, partition.n_shards,
        )


class TableChangesDataSource(DataSource):
    """Register + read:

        spark.dataSource.register(TableChangesDataSource)
        spark.readStream.format("tablechanges").option("path", root).load()
    """

    @classmethod
    def name(cls):
        return "tablechanges"

    def schema(self):
        ddl = self.options.get("table_schema")
        if ddl is None:
            ddl = self._infer_ddl()
        return f"{ddl}, {_META_COLS}"

    def _infer_ddl(self) -> str:
        import pyarrow.parquet as pq

        root = self.options["path"]
        latest = _latest_version(root)
        if latest == 0:
            raise ValueError(
                "tablechanges: table has no snapshot manifest; pass "
                "option('table_schema', ...) or commit a version first"
            )
        m = _load_manifest(root, latest)
        if m.get("schema_json") is not None:
            # evolved table: the log owns the schema — the first file's
            # footer may predate newer columns
            from pyspark.sql.types import StructType

            st = StructType.fromJson(m["schema_json"])
            return ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in st.fields
            )
        if not m["files"]:
            raise ValueError(
                "tablechanges: latest snapshot is empty; pass "
                "option('table_schema', ...)"
            )
        first_rel = m["files"][0]["path"]
        sch = pq.read_schema(_resolve(root, first_rel))
        parts = []
        for field in sch:
            t = str(field.type)
            if t not in _ARROW_TO_DDL:
                raise ValueError(
                    f"tablechanges: cannot infer DDL for column "
                    f"{field.name!r} of arrow type {t!r}; pass "
                    "option('table_schema', ...)"
                )
            parts.append(f"{field.name} {_ARROW_TO_DDL[t]}")
        # hive partition columns (directory k=v segments) come last,
        # mirroring Spark's partition-discovery column order
        import datetime

        for k, v in _hive_parts(first_rel).items():
            cast = _hive_cast(v)
            ddl_t = (
                "INT"
                if isinstance(cast, int)
                else "DATE"
                if isinstance(cast, datetime.date)
                else "STRING"
            )
            parts.append(f"{k} {ddl_t}")
        return ", ".join(parts)

    def _columns(self) -> list[str]:
        ddl = self.schema()
        cols = [c.strip().split()[0] for c in ddl.split(",")]
        return [c for c in cols if c not in ("_change_type", "_commit_version")]

    def reader(self, schema: StructType):
        return TableChangesBatchReader(self.options, self._columns())

    def streamReader(self, schema: StructType):
        return TableChangesStreamReader(self.options, self._columns())
