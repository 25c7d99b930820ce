from data_pipeline_project_spark.sinks.sinks import (
    JdbcAppendSink,
    JdbcUpsertSink,
    ParquetAppendSink,
    ParquetUpsertSink,
    Sink,
)

__all__ = [
    "Sink",
    "ParquetAppendSink",
    "ParquetUpsertSink",
    "JdbcAppendSink",
    "JdbcUpsertSink",
]
