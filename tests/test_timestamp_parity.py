"""P4 timestamp parity (pipeline.py:124,171): the lenient coalesce
must agree with pandas ``pd.to_datetime`` on every format family the
reference's data exercises, and the known divergences on formats
pandas sniffs but the probe list doesn't cover are PINNED here — if
the list grows (or Spark's default parser changes), this test is where
that contract surfaces."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.validation import parse_timestamp_lenient

# Formats both engines must parse to the same instant (reference data
# families + ISO variants).
PARITY_CASES = [
    "2024-01-02 03:04:05",
    "2024-01-02 03:04:05.123",
    "2024-01-02T03:04:05",
    "2024-01-02",
    "06/15/2024 10:00:00",
    "06/15/2024",
]

# pandas sniffs these; the probe list deliberately does not cover them
# (not observed in any reference data). Spark side must yield NULL —
# the documented divergence, pinned so a silent behavior change fails.
DIVERGENT_CASES = [
    "03 June 2021",
    "Jan 2, 2024",
    "20240102",
]


def _spark_parse(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    rows = df.select(
        "raw", parse_timestamp_lenient(F.col("raw")).alias("ts")
    ).collect()
    return {r.raw: r.ts for r in rows}


def test_reference_format_families_match_pandas(spark):
    got = _spark_parse(spark, PARITY_CASES)
    for raw in PARITY_CASES:
        want = pd.to_datetime(raw).to_pydatetime()
        assert got[raw] == want, (raw, got[raw], want)


def test_documented_divergences_stay_null(spark):
    got = _spark_parse(spark, DIVERGENT_CASES)
    for raw in DIVERGENT_CASES:
        assert pd.to_datetime(raw) is not pd.NaT  # pandas does sniff it
        assert got[raw] is None, (raw, got[raw])


def test_unparseable_never_raises(spark):
    junk = ["NOT_A_VALID_TIMESTAMP", "abc", "", "99/99/9999", "2024-13-45"]
    got = _spark_parse(spark, junk)
    assert all(v is None for v in got.values()), got
