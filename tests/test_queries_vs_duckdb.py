"""Every registered query with an oracle must match DuckDB at sf0.01 —
the local replica of the driver's correctness gate."""

import pytest

from data_pipeline_project_spark.plans.registry import get_oracles, get_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import check_query


def _names():
    return sorted(get_queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    problems = check_query(spark, duck, name, SF_ORACLE)
    hard = [p for p in problems if "HASH RISK" not in p]
    assert not hard, f"{name}: {problems}"
    if problems:
        pytest.skip(f"{name}: float not bit-exact but within tol: {problems}")


def test_ngram_jaccard_not_vacuous(spark):
    """The exact-baseline check is only evidence if it finds the planted
    near-dups at the oracle SF — 0 rows == 0 rows proves nothing."""
    from data_pipeline_project_spark.plans.llmops_queries import (
        dedup_ngram_jaccard,
    )

    n = dedup_ngram_jaccard(spark, SF_ORACLE).count()
    assert n > 0


from tests.conftest import EXTRA_ORACLE_QUERIES


@pytest.mark.parametrize("mod_name,fn_name,oracle_name", EXTRA_ORACLE_QUERIES)
def test_deregistered_queries_still_match(spark, duck, mod_name, fn_name, oracle_name):
    """Queries outside the driver's 50-slot registry window (slots
    ceded in round 4, plus round-4 additions) keep full oracle parity
    here so their semantics can't silently rot."""
    import importlib

    from tests.oracle_harness import compare, run_oracle

    from data_pipeline_project_spark.functions.persist_scope import (
        release_scoped_persists,
    )

    # Deregistered queries bypass the registry wrapper that normally
    # releases the previous query's scoped persists — do it here.
    release_scoped_persists()
    mod = importlib.import_module(f"data_pipeline_project_spark.plans.{mod_name}")
    spark_pd = getattr(mod, fn_name)(spark, SF_ORACLE).toPandas()
    oracle_pd = run_oracle(duck, getattr(mod, oracle_name), SF_ORACLE)
    problems = compare(spark_pd, oracle_pd)
    assert not [p for p in problems if "HASH RISK" not in p], problems


def test_every_query_has_oracle_or_is_declared():
    qs, os_ = get_queries(), get_oracles()
    missing = sorted(set(qs) - set(os_))
    # non-SQL-expressible ops may omit oracles; keep the list visible
    print("queries without oracle (rows-only check):", missing)
    assert set(os_) <= set(qs)


def test_stat_moments_production_doubles_path(spark):
    """stat_moments(exact=False) sums doubles instead of DECIMAL(38,6)
    — the production path that removes the 5.1x-per-10x decimal tax
    SCALE_r06 measured at 60M rows. Contract: same schema, same groups,
    values within 1e-6 of the decimal-exact path (the formulas are
    identical; only the accumulator type differs)."""
    from data_pipeline_project_spark.plans.relational_queries import stat_moments

    exact = stat_moments(spark, SF_ORACLE, exact=True).toPandas()
    fast = stat_moments(spark, SF_ORACLE, exact=False).toPandas()
    assert list(exact.columns) == list(fast.columns)
    e = exact.sort_values("l_returnflag").reset_index(drop=True)
    f = fast.sort_values("l_returnflag").reset_index(drop=True)
    assert list(e["l_returnflag"]) == list(f["l_returnflag"])
    for col in e.columns[1:]:
        diff = (e[col] - f[col]).abs().max()
        assert diff <= 1e-6, f"{col}: doubles path drifted by {diff}"
