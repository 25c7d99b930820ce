"""JSONL corpus source and training-shard writer."""

import os

from pyspark.sql import functions as F

from data_pipeline_project_spark.sinks.sinks import write_training_shards
from data_pipeline_project_spark.sources.jsonl_source import (
    read_documents_jsonl,
    split_corrupt,
)
from data_pipeline_project_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE

GOOD = [
    '{"doc_id": 1, "text": "hello world", "meta": {"src": "web"}}',
    '{"doc_id": 2, "text": "second doc", "meta": {}}',
    '{"doc_id": 3, "text": "third"}',
]
BAD = [
    '{"doc_id": 4, "text": "unterminated',
    "not json at all",
]


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.jsonl").write_text("\n".join(GOOD[:2] + BAD[:1]) + "\n")
    (p / "b.jsonl").write_text("\n".join([GOOD[2], BAD[1]]) + "\n")

    clean, quarantined = split_corrupt(read_documents_jsonl(spark, str(p)))
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].text == "hello world" and rows[1].meta == {"src": "web"}
    assert rows[3].meta is None and rows[3].file_name == "b.jsonl"

    q = quarantined.collect()
    assert {r.raw_line for r in q} == set(BAD)
    assert {r.file_name for r in q} == {"a.jsonl", "b.jsonl"}


def test_jsonl_splittable_not_multiline(spark, tmp_path):
    """A pretty-printed (multi-line) JSON object must NOT silently
    parse — it would make the format unsplittable at scale."""
    p = tmp_path / "corpus2"
    p.mkdir()
    (p / "pretty.json").write_text('{\n  "doc_id": 9,\n  "text": "x"\n}\n')
    clean, quarantined = split_corrupt(read_documents_jsonl(spark, str(p)))
    assert clean.count() == 0
    assert quarantined.count() >= 1


def test_training_shards_deterministic_and_bounded(spark, tmp_path):
    docs = load_table(spark, "documents", SF_ORACLE)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, salt_col="doc_id",
                          max_records_per_file=100)

    # hive-partitioned layout, every shard present
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) == [
        f"shard={i}" for i in range(4)
    ]
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # shard id is a pure function of doc_id: rewriting from a different
    # input partitioning yields the identical assignment
    write_training_shards(docs.repartition(13), out + "_b", n_shards=4,
                          salt_col="doc_id")
    a = spark.read.parquet(out).select("doc_id", "shard")
    b = spark.read.parquet(out + "_b").select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # maxRecordsPerFile bounds file size within each shard dir
    for d in os.listdir(out):
        if d.startswith("shard="):
            n_files = len([f for f in os.listdir(os.path.join(out, d))
                           if f.endswith(".parquet")])
            n_rows = back.where(F.col("shard") == int(d.split("=")[1])).count()
            assert n_files >= (n_rows + 99) // 100


def test_jsonl_export_roundtrip(spark, tmp_path):
    """write_documents_jsonl -> read_documents_jsonl reproduces the
    corpus exactly (incl. the meta map), zero corrupt rows, gzip
    shards on disk."""
    import gzip
    import os

    from data_pipeline_project_spark.sources.jsonl_source import (
        read_documents_jsonl,
        split_corrupt,
        write_documents_jsonl,
    )

    docs = spark.createDataFrame(
        [
            (i, f"text with unicode café {i}", {"source": f"src{i % 3}"})
            for i in range(200)
        ],
        "doc_id long, text string, meta map<string,string>",
    )
    path = str(tmp_path / "export")
    write_documents_jsonl(docs.repartition(3), path)

    gz = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert len(gz) == 3
    with gzip.open(os.path.join(path, gz[0]), "rt") as fh:
        assert fh.readline().startswith("{")  # honest JSONL inside

    clean, bad = split_corrupt(read_documents_jsonl(spark, path))
    assert bad.count() == 0
    got = {
        r.doc_id: (r.text, dict(r.meta))
        for r in clean.select("doc_id", "text", "meta").collect()
    }
    want = {
        r.doc_id: (r.text, dict(r.meta))
        for r in docs.collect()
    }
    assert got == want


# ---- feature-hashing doc vectors --------------------------------------------

def test_hashed_doc_vectors_bridge_to_embedding_tier(spark):
    """Signed feature hashing: unit-norm vectors, deterministic across
    partitioning, near-dup docs nearly parallel, unrelated docs far —
    and the output column composes directly with the vector operators
    (cosine_topk)."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_project_spark.operators.similarity import cosine_topk
    from data_pipeline_project_spark.operators.text import hashed_doc_vectors

    base = "spark shuffles partition data across executors for joins " * 5
    near = base + "with one extra trailing clause"
    other = "completely different subject matter about cooking pasta " * 5
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], ["doc_id", "text"]
    )
    v = hashed_doc_vectors(docs, dim=64)
    rows = {r.doc_id: r.embedding for r in v.collect()}
    for vec in rows.values():
        assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-5

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(rows[0], rows[1]) > 0.9
    assert cos(rows[0], rows[2]) < 0.5

    # partitioning invariance
    v2 = hashed_doc_vectors(docs.repartition(5), dim=64)
    rows2 = {r.doc_id: r.embedding for r in v2.collect()}
    assert rows == rows2

    # composes with the vector tier unchanged
    top = cosine_topk(v, v.where("doc_id = 0"), k=1, id_col="doc_id").collect()
    assert top[0].neighbor_id == 1


def test_harmonize_union_aligns_eras(spark):
    from pyspark.sql import functions as F

    from data_pipeline_project_spark.sources.tables import harmonize_union

    era1 = spark.createDataFrame(
        [(1, 20)], ["sensor_id", "temp"]  # old name, int readings
    )
    era2 = spark.createDataFrame(
        [(2, 21.5, 0.4)], ["sensor_id", "temperature", "humidity"]
    )
    # column order scrambled on purpose: by-name union must not care
    era3 = spark.createDataFrame(
        [(0.7, 3, 22.0)], ["humidity", "sensor_id", "temperature"]
    )
    got = harmonize_union(
        [era1, era2, era3],
        renames={"temp": "temperature"},
        casts={"temperature": "double"},
    )
    rows = {r.sensor_id: (r.temperature, r.humidity) for r in got.collect()}
    assert rows == {1: (20.0, None), 2: (21.5, 0.4), 3: (22.0, 0.7)}
    assert dict(got.dtypes)["temperature"] == "double"


def test_observation_audit_without_second_scan(spark):
    """Spark's Observation API: audit metrics (row count, null count)
    ride the SAME job as the real output - no second scan, which at
    100 TB is the difference between free audit and double cost."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_pipeline_project_spark.sources.tables import load_table

    # Isolation note: an Observation registers state on the session
    # whose JVM-side ObservationManager is NOT serializable - a later
    # pyspark.ml job on the SAME session then fails closure
    # serialization (observed: LBFGS tasks dying with
    # NotSerializableException: ObservationManager). Observe on a
    # child session; production code should scope observations the
    # same way when ML jobs share the session.
    session = spark.newSession()
    obs = Observation("audit")
    ev = load_table(session, "events", "/root/testdata/sf0.001")
    out = ev.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
    ).where(F.col("event_type") == "purchase")
    n_purchases = out.count()  # ONE action drives both output and audit
    m = obs.get
    assert m["rows_seen"] == ev.count()
    assert m["null_values"] == 0
    assert 0 < n_purchases < m["rows_seen"]
