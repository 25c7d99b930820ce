"""Persistent TableCatalog (r13): durable name -> path registry.

The r12 ``LakehouseSQL`` catalog was an in-memory dict — names died
with the process and two front doors could disagree. The catalog is
now a manifest-style versioned log whose slots are claimed through
the same LogStore CAS that serializes table commits, so CREATE/DROP
are exactly-one-winner across threads AND real OS processes (spawn —
fork under a live Spark JVM severs the parent's Py4J gateway, see
tests/test_logstore_sqlite.py).
"""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest

from data_pipeline_project_spark.sinks.catalog import (
    CatalogError,
    TableCatalog,
)

N_PROCS = 6


def _create_same_name_worker(root, path_suffix, barrier, q):
    cat = TableCatalog(root)
    barrier.wait()
    try:
        cat.create_table("shared", f"/data/{path_suffix}")
        q.put(("won", path_suffix))
    except CatalogError:
        q.put(("lost", path_suffix))
    except Exception as e:  # noqa: BLE001
        q.put(("err", repr(e)))


def _create_distinct_worker(root, name, barrier, q):
    cat = TableCatalog(root)
    barrier.wait()
    try:
        cat.create_table(name, f"/data/{name}")
        q.put(("ok", name))
    except Exception as e:  # noqa: BLE001
        q.put(("err", repr(e)))


@pytest.fixture()
def ctx():
    return mp.get_context("spawn")


def test_create_resolve_drop_roundtrip(tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    assert cat.tables() == {} and cat.version() == 0
    v1 = cat.create_table("events", str(tmp_path / "events"))
    assert v1["version"] == 1
    assert cat.resolve("events") == str(tmp_path / "events")
    with pytest.raises(CatalogError, match="already exists"):
        cat.create_table("events", "/other")
    assert cat.create_table(
        "events", str(tmp_path / "events"), if_not_exists=True
    )["noop"]
    cat.create_table("docs", str(tmp_path / "docs"))
    assert sorted(cat.tables()) == ["docs", "events"]
    cat.drop_table("events")
    assert sorted(cat.tables()) == ["docs"]
    with pytest.raises(CatalogError, match="unknown table"):
        cat.resolve("events")
    with pytest.raises(CatalogError, match="unknown table"):
        cat.drop_table("events")
    assert cat.drop_table("events", if_exists=True)["noop"]
    ops = [(h["op"], h["table"]) for h in cat.history()]
    assert ops == [
        ("drop_table", "events"),
        ("create_table", "docs"),
        ("create_table", "events"),
    ]


def test_names_survive_instance_boundaries(tmp_path):
    """Two independent instances over one root see ONE namespace —
    the restart/second-front-door property the dict catalog lacked."""
    root = str(tmp_path / "cat")
    TableCatalog(root).create_table("t", "/data/t")
    fresh = TableCatalog(root)
    assert fresh.resolve("t") == os.path.abspath("/data/t")
    fresh.drop_table("t")
    assert TableCatalog(root).tables() == {}


def test_invalid_names_refused(tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    for bad in ("", "a b", "a;drop", "a/b"):
        with pytest.raises(CatalogError, match="alphanumeric"):
            cat.create_table(bad, "/x")


def test_concurrent_create_same_name_one_winner(tmp_path, ctx):
    """N processes race CREATE TABLE of ONE name: exactly one wins,
    every loser gets a loud CatalogError, and the committed mapping is
    the winner's — the CAS property item #2's 'done' demands."""
    root = str(tmp_path / "cat")
    barrier = ctx.Barrier(N_PROCS)
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_create_same_name_worker, args=(root, f"p{i}", barrier, q)
        )
        for i in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert not [r for r in results if r[0] == "err"], results
    wins = [r for r in results if r[0] == "won"]
    assert len(wins) == 1, results
    cat = TableCatalog(root)
    assert cat.tables() == {"shared": f"/data/{wins[0][1]}"}
    # exactly one catalog version was committed for the one CREATE
    assert cat.version() == 1


def test_concurrent_create_distinct_names_all_land(tmp_path, ctx):
    """N processes CREATE N different names: the claim-retry loop
    rebases losers onto the new head, so every name lands and no
    committed version is lost."""
    root = str(tmp_path / "cat")
    barrier = ctx.Barrier(N_PROCS)
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_create_distinct_worker, args=(root, f"t{i}", barrier, q)
        )
        for i in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert all(r[0] == "ok" for r in results), results
    cat = TableCatalog(root)
    assert sorted(cat.tables()) == [f"t{i}" for i in range(N_PROCS)]
    assert cat.version() == N_PROCS  # gapless: one version per CREATE


def test_drop_keeps_table_data(tmp_path, spark):
    """DROP TABLE unregisters the NAME only — external-table
    semantics; the lakehouse itself stays readable by path."""
    from pyspark.sql import functions as F

    from data_pipeline_project_spark.sinks.manifest import (
        read_version,
        write_versioned_manifest,
    )

    t = str(tmp_path / "t")
    spark.range(0, 50).select(F.col("id").alias("k")).coalesce(
        1
    ).write.parquet(t)
    write_versioned_manifest(t)
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.create_table("t", t)
    cat.drop_table("t")
    assert read_version(spark, t).count() == 50
