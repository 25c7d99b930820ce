"""JSONL document source — the interchange format LLM training corpora
actually arrive in (one JSON object per line: Common Crawl derivatives,
RedPajama/Dolma-style dumps, annotation exports).

Design, mirroring the CSV source's two-frame contract
(``sources/csv_source.py``):

- **line-delimited only** (``multiLine=false``): each line is an
  independent record, so a 100 TB dump splits at newline boundaries and
  every executor core gets work. Multi-line JSON is unsplittable — one
  task per file — and is deliberately not supported here.
- **explicit schema**: inferring the schema costs a full extra pass
  over the data and makes the contract depend on whichever files the
  sampler happened to read; a corpus schema is a declared interface.
- **PERMISSIVE + corrupt-record quarantine**: a malformed line lands in
  ``_corrupt_record`` instead of failing the scan (a bad record must
  never kill a 100 TB job); ``split_corrupt`` separates the two frames,
  same shape as the CSV row quarantine.
- **text scan + ``from_json``, not the JSON data source**: Spark
  refuses queries that filter the JSON reader's internal corrupt column
  without caching the parse (SQLSTATE 0A000) — and caching a 100 TB
  scan is not an option. Reading raw lines and parsing with
  ``from_json`` sidesteps the restriction: still one splittable pass,
  both output frames stay lazy, corrupt lines carry the raw text.
- **lineage** via ``_metadata.file_name`` (defined under joins, unlike
  ``input_file_name()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_COL = "file_name"
CORRUPT_COL = "_corrupt_record"

# The documents-table contract (TESTDATA.md) as it would arrive in a
# JSONL drop: identity, payload, and free-form metadata.
DOCUMENT_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(CORRUPT_COL, T.StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_JSONL_SCHEMA,
) -> DataFrame:
    """One splittable scan; malformed lines arrive with ``doc_id``/
    ``text`` null and the raw line in ``_corrupt_record``."""
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must carry {CORRUPT_COL!r} for quarantine")
    raw = (
        spark.read.text(path)
        .select(F.col("_metadata.file_name").alias(FILE_COL), "value")
        .where(F.trim("value") != "")  # the JSON reader skips blank lines too
    )
    parsed = raw.select(
        FILE_COL,
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_rec"),
    )
    return parsed.select(FILE_COL, "_rec.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean drops the corrupt column; quarantined
    keeps (file_name, raw line) for the audit trail. Both frames stay
    lazy — ``from_json`` carries no corrupt-column query restriction,
    so neither branch forces a cache or reparse."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        FILE_COL, F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantined


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    max_records_per_file: int | None = 100_000,
) -> None:
    """Corpus interchange export: gzip JSONL shards — the format every
    external training-data consumer (and this module's own reader)
    speaks. ``maxRecordsPerFile`` bounds shard size so downstream
    loaders stream rather than slurp; writing distributes with the
    frame's partitioning (repartition upstream to set shard count).
    Round-trips through :func:`read_documents_jsonl` byte-faithfully
    for the document schema (doc_id, text, meta)."""
    w = df.write.mode("overwrite").option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)
