"""Custom Python DataSource (Spark 4 connector API): a deterministic
sensor-reading simulator, batch + streaming.

The reference's input surface is "CSV files appear in a directory"
(S1-S8); this is the CONNECTOR-level twin — the engine's source
surface is extensible in pure Python via the DataSource API, and this
module exercises the whole extension point: schema declaration,
option handling, partition planning (batch), and offset
tracking/exactly-once batch planning (streaming). Registered as
``sensorsim``:

    spark.dataSource.register(SensorSimDataSource)
    spark.read.format("sensorsim").option("n_rows", 1000).load()
    spark.readStream.format("sensorsim").option("n_rows", 1000).load()

Everything is DETERMINISTIC (md5 of the global row index), so reads
are reproducible across runs, partition counts, and batch boundaries —
the property every test and every replayed stream depends on. Rows
carry the same (sensor_id, ts, temperature, humidity, pressure)
contract as the CSV source, so the validation pipeline composes
unchanged on top.

Scale notes: partition planning is driver-side metadata (ranges, no
data); each task generates its slice independently (no shared state,
no skew — ranges are equal by construction). A real connector replaces
``_row`` with its client library; the planning/offset skeleton is the
part Spark needs and the part this module pins with tests.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "sensor_id INT, ts TIMESTAMP, temperature DOUBLE, humidity DOUBLE, "
    "pressure DOUBLE"
)

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _row(i: int, n_sensors: int, period_seconds: int):
    """Deterministic reading #i: values derived from md5(i) so any
    partitioning of the index range yields identical data."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    a = int(h[:8], 16)
    b = int(h[8:16], 16)
    c = int(h[16:24], 16)
    ts = (_EPOCH + timedelta(seconds=i * period_seconds)).replace(tzinfo=None)
    return (
        i % n_sensors,
        ts,
        round(-20.0 + (a % 7000) / 100.0, 2),   # -20.00 .. 49.99 C
        round((b % 10000) / 100.0, 2),          # 0 .. 99.99 %
        round(900.0 + (c % 20000) / 100.0, 2),  # 900 .. 1099.99 hPa
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SensorSimReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_sensors = int(options.get("n_sensors", 50))
        self.period_seconds = int(options.get("period_seconds", 60))

    def partitions(self):
        if self.n_rows <= 0:
            return [_RangePartition(0, 0)]  # empty source, not a crash
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_sensors, self.period_seconds)


class SensorSimStreamReader(DataSourceStreamReader):
    """Micro-batch offsets over the same deterministic row space: the
    offset is the count of rows emitted so far, latestOffset() reports
    everything currently available (for this finite simulator: all
    ``n_rows`` — availableNow computes its drain target from ONE
    latestOffset call at query start, so an incrementally-advancing
    answer would under-drain), and partitions(start, end) re-plans the
    batch's index range — a replayed batch therefore regenerates
    EXACTLY the same rows, which is the contract streaming checkpoint
    recovery assumes of a source."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.n_sensors = int(options.get("n_sensors", 50))
        self.period_seconds = int(options.get("period_seconds", 60))

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        return {"row": self.n_rows}

    def partitions(self, start, end):
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = -(-(hi - lo) // self.n_partitions)
        return [
            _RangePartition(a, min(a + per, hi)) for a in range(lo, hi, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_sensors, self.period_seconds)

    def commit(self, end):
        pass


class SensorSimDataSource(DataSource):
    @classmethod
    def name(cls):
        return "sensorsim"

    def schema(self):
        return _SCHEMA_DDL

    def reader(self, schema: StructType):
        return SensorSimReader(self.options)

    def streamReader(self, schema: StructType):
        return SensorSimStreamReader(self.options)


# ---- custom writer: staged-commit JSONL sink --------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_path: str
    rows: int


class JsonlAuditWriter(DataSourceWriter):
    """The WRITE side of the connector extension point, with the
    two-phase commit protocol a real sink needs: each task writes its
    partition to a STAGED file named by (task, uuid) and returns a
    commit message; only the driver's commit() promotes staged files
    into the target directory and stamps ``_SUCCESS`` with the file
    list — so a failed/speculated/retried task leaves at most an
    orphaned staged file, never a half-visible result, and readers
    trusting ``_SUCCESS`` get exactly-once output. abort() removes the
    staged files. (This is the FileCommitProtocol idea, spelled in
    ~40 lines of Python against the DataSource API.)"""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlaudit sink requires option 'path'")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged_path=name, rows=n)

    def commit(self, messages):
        import json as _json
        import os

        final = []
        for m in messages:
            target = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, target)
            final.append({"file": os.path.basename(target), "rows": m.rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            _json.dump({"files": final, "total_rows": sum(f["rows"] for f in final)}, fh)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class JsonlAuditDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonlaudit"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlAuditWriter(self.options)
