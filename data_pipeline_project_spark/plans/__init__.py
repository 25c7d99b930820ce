from data_pipeline_project_spark.plans.registry import (
    ORACLES,
    QUERIES,
    get_oracles,
    get_queries,
    register,
)

__all__ = ["ORACLES", "QUERIES", "get_oracles", "get_queries", "register"]
