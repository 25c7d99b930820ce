"""Thread-locality of the active cross-table transaction (r12, r11
ADVICE): a plain module global silently captured ANY thread's commit
on a participant table into the open transaction — a concurrent
streaming sink or maintenance thread committing to the same table
would stage instead of publish and get rolled back on abort — and
two concurrent transactions in one process collided on the
do-not-nest guard. With thread-local installation, only the
coordinator's own thread stages; every other thread behaves like the
independent peer it logically is.

Also pins the r12 grace upgrades: the per-transaction grace window
rides the txn2 stamp (concurrent writers honor it), and the
coordinator HEARTBEAT extends a writer's patience while fresh — a
live coordinator mid-prepare is never presumed-aborted inside one
plain grace window, while a crashed one is detected.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks import manifest as M
from data_pipeline_project_spark.sinks.manifest import (
    append_snapshot,
    read_version,
    write_versioned_manifest,
)
from data_pipeline_project_spark.sinks.txn import transaction


@pytest.fixture(autouse=True)
def _fast_grace():
    prev = M.TXN_INDOUBT_GRACE_SECS
    M.TXN_INDOUBT_GRACE_SECS = 0.05
    yield
    M.TXN_INDOUBT_GRACE_SECS = prev
    M._clear_active_txn()


def _pair(spark, tmp_path, tag=""):
    raw = str(tmp_path / f"raw{tag}")
    agg = str(tmp_path / f"agg{tag}")
    for p in (raw, agg):
        spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        ).coalesce(1).write.parquet(p)
        write_versioned_manifest(p)
    return raw, agg


def test_other_threads_commit_publishes_not_stages(spark, tmp_path):
    """While a transaction is OPEN (nothing staged yet), another
    thread commits to a participant table: the commit must PUBLISH
    immediately — not be captured into the transaction and rolled
    back on its abort (the r11 global-capture bug)."""
    raw, agg = _pair(spark, tmp_path)
    errs = []

    with transaction([raw, agg]) as t:
        def peer():
            try:
                append_snapshot(
                    spark, raw,
                    spark.createDataFrame(
                        [(900, 9)], "k long, v long"
                    ).coalesce(1),
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        th = threading.Thread(target=peer)
        th.start()
        th.join(timeout=60)
        assert not errs, errs
        # published immediately — visible BEFORE the txn resolves,
        # and never staged into the transaction
        assert os.path.abspath(raw) not in t.staged
        assert 900 in {r.k for r in read_version(spark, raw).collect()}
        # the coordinator's own staged work still publishes atomically
        append_snapshot(
            spark, agg,
            spark.createDataFrame([(901, 1)], "k long, v long")
            .coalesce(1),
        )
        append_snapshot(
            spark, raw,
            spark.createDataFrame([(902, 1)], "k long, v long")
            .coalesce(1),
        )
    rows = {r.k for r in read_version(spark, raw).collect()}
    assert {900, 902} <= rows
    assert 901 in {r.k for r in read_version(spark, agg).collect()}


def test_concurrent_transactions_in_different_threads(spark, tmp_path):
    """Two coordinators on disjoint table pairs, one process: the old
    do-not-nest module-global guard made this impossible."""
    raw1, agg1 = _pair(spark, tmp_path, "1")
    raw2, agg2 = _pair(spark, tmp_path, "2")
    errs = []
    started = threading.Barrier(2, timeout=60)

    def run(raw, agg, k):
        try:
            with transaction([raw, agg]):
                started.wait()
                append_snapshot(
                    spark, raw,
                    spark.createDataFrame([(k, 1)], "k long, v long")
                    .coalesce(1),
                )
                append_snapshot(
                    spark, agg,
                    spark.createDataFrame([(k, 2)], "k long, v long")
                    .coalesce(1),
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=(raw1, agg1, 111))
    t2 = threading.Thread(target=run, args=(raw2, agg2, 222))
    t1.start(); t2.start()
    t1.join(timeout=120); t2.join(timeout=120)
    assert not errs, errs
    assert 111 in {r.k for r in read_version(spark, raw1).collect()}
    assert 222 in {r.k for r in read_version(spark, raw2).collect()}


def test_heartbeat_extends_writer_patience_for_live_coordinator(
    spark, tmp_path
):
    """An in-doubt staged version whose coordinator is ALIVE (fresh
    heartbeat) is not presumed-aborted within the plain grace window
    — the writer waits on liveness; stopping the heartbeat lets the
    abort land one grace later."""
    raw, agg = _pair(spark, tmp_path)
    t = transaction([raw, agg]).__enter__()
    append_snapshot(
        spark, raw,
        spark.createDataFrame([(900, 1)], "k long, v long").coalesce(1),
    )
    staged = t.staged[os.path.abspath(raw)]
    assert staged["txn2"]["grace"] == pytest.approx(0.05)

    # the writer is "another process": clear the thread-local and
    # time the in-doubt RESOLUTION itself (not a whole Spark commit)
    M._clear_active_txn()
    t0 = time.monotonic()
    outcome = M._txn2_outcome(staged, force_abort=True)
    waited = time.monotonic() - t0
    # with a live heartbeat, the presumed-abort waited out the 20x
    # liveness hard cap (1s), far past the plain 0.05s grace
    assert outcome == "aborted"
    assert waited >= 0.5, waited
    assert M._read_marker_settled(t.marker) == "aborted"
    t.simulate_crash()


def test_dead_coordinator_detected_within_one_grace(spark, tmp_path):
    raw, agg = _pair(spark, tmp_path)
    t = transaction([raw, agg]).__enter__()
    append_snapshot(
        spark, raw,
        spark.createDataFrame([(900, 1)], "k long, v long").coalesce(1),
    )
    staged = t.staged[os.path.abspath(raw)]
    t.simulate_crash()  # heartbeat stops, installation dropped
    time.sleep(0.06)  # let the last heartbeat go stale
    t0 = time.monotonic()
    outcome = M._txn2_outcome(staged, force_abort=True)
    waited = time.monotonic() - t0
    assert outcome == "aborted"
    assert waited < 0.5, waited  # ~one grace window, not the hard cap
    assert M._read_marker_settled(t.marker) == "aborted"
    # and a real writer lands cleanly on the resolved table
    append_snapshot(
        spark, raw,
        spark.createDataFrame([(901, 1)], "k long, v long").coalesce(1),
    )
