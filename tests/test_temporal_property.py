"""Property test: asof_join must agree with pandas.merge_asof — the
canonical single-node reference semantics (inclusive matches, backward/
forward directions, tolerance) — on randomized inputs.

Spark-session startup is too heavy per-example, so hypothesis drives
the data generation and one session (the suite fixture) evaluates all
examples; deadline disabled accordingly.
"""

from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_pipeline_project_spark.operators.temporal import asof_join

_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Small key/time domains force collisions: many rows per key, equal-ts
# ties across sides (exact-match semantics), keys present on only one
# side — the cases a bespoke implementation gets wrong.
_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, minutes)
    min_size=0,
    max_size=25,
)


def _mk(rows, id_start):
    # unique ts per (key, side): merge_asof picks the LAST of equal-ts
    # right rows, Spark's tie order differs — dedup keeps semantics
    # comparable without weakening the interesting equal-ts-ACROSS-side
    # case, which stays fully exercised.
    seen, out = set(), []
    for i, (k, m) in enumerate(rows):
        if (k, m) not in seen:
            seen.add((k, m))
            out.append((k, id_start + i, _BASE + timedelta(minutes=m), float(m)))
    return out


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


SCHEMA_L = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("lid", T.LongType()),
        T.StructField("lts", T.TimestampType()),
        T.StructField("lv", T.DoubleType()),
    ]
)
SCHEMA_R = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("rid", T.LongType()),
        T.StructField("rts", T.TimestampType()),
        T.StructField("rv", T.DoubleType()),
    ]
)


@given(lrows=_rows, rrows=_rows, direction=st.sampled_from(["backward", "forward"]),
       tol_min=st.sampled_from([None, 0, 7, 25]))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_matches_pandas_merge_asof(_spark, lrows, rrows, direction, tol_min):
    left_rows, right_rows = _mk(lrows, 1000), _mk(rrows, 2000)

    lp = pd.DataFrame(left_rows, columns=["k", "lid", "lts", "lv"]).sort_values("lts")
    rp = pd.DataFrame(right_rows, columns=["k", "rid", "rts", "rv"]).sort_values("rts")
    lp["lts"] = pd.to_datetime(lp["lts"]).dt.tz_localize(None) if len(lp) else lp["lts"]
    rp["rts"] = pd.to_datetime(rp["rts"]).dt.tz_localize(None) if len(rp) else rp["rts"]

    if len(lp) == 0:
        return  # nothing to compare
    if len(rp) == 0:
        expected = {lid: None for lid in lp["lid"]}
    else:
        merged = pd.merge_asof(
            lp.sort_values(["lts", "lid"]),
            rp.rename(columns={"rts": "_rts"}).sort_values("_rts"),
            left_on="lts",
            right_on="_rts",
            by="k",
            direction=direction,
            allow_exact_matches=True,
            tolerance=None if tol_min is None else pd.Timedelta(minutes=tol_min),
        )
        expected = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }

    ldf = _spark.createDataFrame(left_rows, SCHEMA_L)
    rdf = _spark.createDataFrame(right_rows, SCHEMA_R)
    got_rows = asof_join(
        ldf,
        rdf,
        on="k",
        left_ts="lts",
        right_ts="rts",
        right_cols=["rid"],
        direction=direction,
        tolerance_seconds=None if tol_min is None else tol_min * 60,
    ).collect()
    got = {int(r.lid): (None if r.right_rid is None else int(r.right_rid))
           for r in got_rows}

    assert got == expected
