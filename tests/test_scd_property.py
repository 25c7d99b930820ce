"""Property test: scd2_merge must agree with a straightforward
single-node SCD2 simulator on randomized dimensions and change batches
— small key/attr/time domains force the interesting collisions
(multiple changes per key, no-op runs, changes at the dimension's own
valid_from instant, brand-new keys, untouched keys).

One Spark session (suite fixture) evaluates all hypothesis examples;
deadline disabled accordingly (same pattern as
tests/test_temporal_property.py)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_project_spark.operators.scd import scd2_merge

_D0 = dt.date(2020, 1, 1)


def _day(n):
    return _D0 + dt.timedelta(days=n)


# dim: up to 4 keys, each one OPEN row (plus optionally one closed
# historical row ending where the open one starts).
_dims = st.lists(
    st.tuples(
        st.integers(0, 3),              # key
        st.sampled_from("abc"),         # open attr
        st.integers(0, 3),              # open valid_from day
        st.booleans(),                  # carries a closed predecessor
    ),
    min_size=0, max_size=4,
    unique_by=lambda t: t[0],
)

# changes: (key 0..5 — 4,5 are brand-new keys, attr, day, seq)
_changes = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.sampled_from("abc"),
        st.integers(0, 10),
        st.integers(0, 100),
    ),
    min_size=0, max_size=12,
    unique_by=lambda t: (t[0], t[2], t[3]),  # (key, ts, seq) is unique
)


def _simulate(dim_rows, change_rows):
    """Reference SCD2: per key, replay [open-version-as-pseudo-change,
    then changes ordered by (ts, seq)], collapsing equal-attr runs."""
    out = []
    open_row = {}
    for k, attr, day, closed in dim_rows:
        if closed:
            out.append((k, "z", _day(day - 1), _day(day)))  # closed history
        open_row[k] = (attr, _day(day))
    by_key = {}
    for k, attr, day, seq in change_rows:
        if k in open_row and _day(day) < open_row[k][1]:
            continue  # stale: predates the open version (discarded)
        by_key.setdefault(k, []).append((_day(day), seq, attr))
    for k in set(open_row) | set(by_key):
        seq_rows = []
        if k in open_row:
            attr, vf = open_row[k]
            seq_rows.append((vf, -1, attr))  # pseudo-change, ordered first
        seq_rows += sorted(by_key.get(k, []))
        versions = []
        for ts, _, attr in seq_rows:
            if not versions or versions[-1][0] != attr:
                versions.append((attr, ts))
        for i, (attr, vf) in enumerate(versions):
            vt = versions[i + 1][1] if i + 1 < len(versions) else None
            out.append((k, attr, vf, vt))
    return sorted(out, key=lambda t: (t[0], str(t[1]), t[2], str(t[3])))


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(dim_rows=_dims, change_rows=_changes)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_matches_reference_simulator(_spark, dim_rows, change_rows):
    dim_data = []
    for k, attr, day, closed in dim_rows:
        if closed:
            dim_data.append((k, "z", _day(day - 1), _day(day)))
        dim_data.append((k, attr, _day(day), None))
    dim = _spark.createDataFrame(
        dim_data, "k int, attr string, valid_from date, valid_to date"
    )
    changes = _spark.createDataFrame(
        [(k, a, _day(d), s) for k, a, d, s in change_rows],
        "k int, attr string, ts date, seq long",
    )
    got = sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to)
         for r in scd2_merge(
             dim, changes, key_col="k", attr_cols=["attr"],
             change_ts_col="ts", order_cols=["seq"],
         ).collect()),
        key=lambda t: (t[0], str(t[1]), t[2], str(t[3])),
    )
    assert got == _simulate(dim_rows, change_rows)
