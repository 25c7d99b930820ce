"""Lakehouse ops on hive-partitioned manifest tables (round 9): the
common production shape — an events table partitioned by day/shard —
must support the targeted writers and both change feeds.

Contracts under test:

- targeted MERGE appends land INSIDE partition directories (a flat
  append at the root breaks partition discovery for every later read),
  and an update that changes a row's partition value moves it to its
  new directory;
- merge on the partition column itself is refused loudly (its values
  live in directory names, not parquet footers — zone maps can't see
  it);
- table-wide rewrites (merge_bulk / delete_bulk / rewrite_table /
  compact_snapshot) refuse partitioned layouts loudly instead of
  flattening the directories;
- both change feeds (snapshot_changes and the tablechanges source)
  surface the partition columns, exactly like a basePath read;
- partition PRUNING: a filter on the partition column reaches the
  scan's PartitionFilters — reading one day touches one directory;
- a randomized op-sequence model check (merge / targeted delete / DV
  delete) against a dict reference model, with time-travel probes.

DV row identity on partitioned layouts (same part-file basename in
sibling directories) is covered in test_deletion_vectors.py.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks.manifest import (
    delete_bulk,
    delete_rows_dv,
    delete_rows_targeted,
    merge_bulk,
    merge_upsert,
    read_version,
    rewrite_table,
    snapshot_changes,
    snapshot_versions,
    write_versioned_manifest,
)


def _ptable(spark, path, n=400, shards=4):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7) % 101).alias("v"),
        (F.col("id") % shards).cast("int").alias("shard"),
    )
    df.repartition(2).write.partitionBy("shard").parquet(path)
    write_versioned_manifest(path)


def test_partitioned_merge_updates_inserts_and_moves_rows(spark, duck, tmp_path):
    path = str(tmp_path / "t")
    _ptable(spark, path)

    updates = spark.createDataFrame(
        [
            (5, -1, 1),      # update in place (5 % 4 == 1)
            (6, -2, 2),      # update in place
            (7, -3, 0),      # update that MOVES partitions (7 % 4 == 3 -> 0)
            (9999, -4, 3),   # insert
        ],
        "k long, v long, shard int",
    )
    res = merge_upsert(spark, duck, path, "k", updates)
    assert res["rows_updated"] == 3 and res["rows_inserted"] == 1

    live = read_version(spark, path)
    assert live.count() == 401
    got = {r.k: (r.v, r.shard) for r in live.where(
        "k in (5, 6, 7, 9999)").collect()}
    assert got == {5: (-1, 1), 6: (-2, 2), 7: (-3, 0), 9999: (-4, 3)}
    # the moved row left its old partition
    assert live.where("shard = 3 and k = 7").count() == 0
    # time travel still shows the pre-merge placement
    v1 = read_version(spark, path, 1)
    assert v1.where("k = 7").collect()[0].shard == 3
    # no data file sits flat at the root (partition discovery intact)
    import os

    root_parquets = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert root_parquets == []


def test_partition_column_key_and_bulk_ops_refused(spark, duck, tmp_path):
    path = str(tmp_path / "t")
    _ptable(spark, path)

    with pytest.raises(ValueError, match="PARTITION column"):
        merge_upsert(
            spark, duck, path, "shard",
            spark.createDataFrame([(1, 0, 0)], "k long, v long, shard int"),
        )
    upd = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit(0).alias("v"),
        F.lit(0).cast("int").alias("shard"),
    )
    with pytest.raises(ValueError, match="partition"):
        merge_bulk(spark, path, "k", upd)
    with pytest.raises(ValueError, match="partition"):
        delete_bulk(spark, path, "k", upd.select("k"))
    with pytest.raises(ValueError, match="partition"):
        rewrite_table(spark, path, "k")


def test_partitioned_change_feeds_carry_partition_columns(spark, duck, tmp_path):
    from data_pipeline_project_spark.sources.table_changes import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    path = str(tmp_path / "t")
    _ptable(spark, path, n=100)

    merge_upsert(
        spark, duck, path, "k",
        spark.createDataFrame(
            [(5, -1, 1), (500, -2, 0)], "k long, v long, shard int"
        ),
    )  # v2: one update (delete+insert), one insert
    delete_rows_dv(
        spark, duck, path, "k", spark.createDataFrame([(6,)], "k long")
    )  # v3: one DV delete

    ch2 = snapshot_changes(spark, path, 1, 2)
    assert "shard" in ch2.columns
    rows2 = {(r.k, r.v, r.shard, r._change_type) for r in ch2.collect()}
    assert rows2 == {
        (5, 35, 1, "delete"),
        (5, -1, 1, "insert"),
        (500, -2, 0, "insert"),
    }
    ch3 = {(r.k, r.shard, r._change_type)
           for r in snapshot_changes(spark, path, 2, 3).collect()}
    assert ch3 == {(6, 2, "delete")}

    feed = spark.read.format("tablechanges").option("path", path).load()
    assert "shard" in feed.columns
    f2 = {(r.k, r.v, r.shard, r._change_type)
          for r in feed.where("_commit_version = 2").collect()}
    assert f2 == rows2
    f3 = {(r.k, r.shard, r._change_type)
          for r in feed.where("_commit_version = 3").collect()}
    assert f3 == ch3
    # version 1 streams the initial content with partition values intact
    f1 = feed.where("_commit_version = 1")
    assert f1.count() == 100
    assert f1.where("shard is null").count() == 0
    assert {r.shard for r in f1.select("shard").distinct().collect()} == {0, 1, 2, 3}


def test_partition_pruning_reaches_the_scan(spark, duck, tmp_path):
    path = str(tmp_path / "t")
    _ptable(spark, path)
    merge_upsert(
        spark, duck, path, "k",
        spark.createDataFrame([(5, -1, 1)], "k long, v long, shard int"),
    )

    probe = read_version(spark, path).where("shard = 1")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    # and only that partition's rows come back
    assert probe.count() == 100 + 0  # 400/4 rows, k=5's update stayed in shard 1


def test_partitioned_op_sequences_match_reference_model(spark, duck, tmp_path):
    """Randomized merge/targeted-delete/DV-delete sequences on a
    partitioned table vs a dict model; live state checked after every
    op, every version replayed at the end (time travel)."""
    for seed in (31, 32):
        rng = random.Random(seed)
        path = str(tmp_path / f"t{seed}")
        n, shards = 240, 3
        _ptable(spark, path, n=n, shards=shards)
        model = {k: ((k * 7) % 101, k % shards) for k in range(n)}
        history = [dict(model)]

        def check_live():
            live = {
                r.k: (r.v, r.shard)
                for r in read_version(spark, path).collect()
            }
            assert live == model, f"seed {seed}: live state diverged"

        for _ in range(6):
            op = rng.choice(["merge", "delete", "delete_dv"])
            keys = rng.sample(range(0, n + 40), rng.randrange(1, 6))
            v_before = snapshot_versions(path)[-1]
            if op == "merge":
                rows = [
                    (k, -rng.randrange(1, 50), rng.randrange(0, shards))
                    for k in keys
                ]
                merge_upsert(
                    spark, duck, path, "k",
                    spark.createDataFrame(rows, "k long, v long, shard int"),
                )
                for k, v, s in rows:
                    model[k] = (v, s)
            elif op == "delete":
                delete_rows_targeted(
                    spark, duck, path, "k",
                    spark.createDataFrame([(k,) for k in keys], "k long"),
                )
                write_versioned_manifest(path)
                for k in keys:
                    model.pop(k, None)
            else:
                delete_rows_dv(
                    spark, duck, path, "k",
                    spark.createDataFrame([(k,) for k in keys], "k long"),
                )
                for k in keys:
                    model.pop(k, None)
            if snapshot_versions(path)[-1] != v_before:
                # a DV delete matching only absent keys commits nothing
                history.append(dict(model))
            check_live()

        # time travel: every committed version replays its model state
        versions = snapshot_versions(path)
        assert len(versions) == len(history)
        for v, want in zip(versions, history):
            got = {
                r.k: (r.v, r.shard)
                for r in read_version(spark, path, v).collect()
            }
            assert got == want, f"seed {seed}: version {v} diverged"
