"""Query registry — the single source for the driver contract.

Each engine capability (SURVEY.md §2 inventory + LLM-ops extensions) is
a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus, when
SQL-expressible, an equivalent ANSI-SQL oracle string DuckDB runs on the
same parquet tables. ``__spark_entry__.queries()/oracle_sql()`` read
these dicts.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_project_spark.functions.persist_scope import (
    release_scoped_persists,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "data_pipeline_project_spark.plans.sensor_queries",
    "data_pipeline_project_spark.plans.relational_queries",
    "data_pipeline_project_spark.plans.streaming_queries",
    "data_pipeline_project_spark.plans.temporal_queries",
    "data_pipeline_project_spark.plans.llmops_queries",
    "data_pipeline_project_spark.plans.catalog_queries",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        # Release the PREVIOUS query's scoped persists when this one is
        # built: builders persist shared intermediates they cannot
        # unpersist themselves (the result is materialized later by the
        # driver/bench). See functions/persist_scope.py.
        @functools.wraps(fn)
        def scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped_persists()
            return fn(spark, sf_dir)

        QUERIES[name] = scoped
        if oracle is not None:
            ORACLES[name] = oracle
        return scoped

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def get_queries() -> dict[str, QueryFn]:
    _load()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    _load()
    return dict(ORACLES)
