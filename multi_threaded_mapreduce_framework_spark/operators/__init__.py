"""Custom operators: the reference client-contract adapter and operators
Spark lacks natively (dedup families, similarity search, multimodal)."""

from multi_threaded_mapreduce_framework_spark.operators.mapreduce import (
    JobHandle,
    JobState,
    Stage,
    run_mapreduce,
    run_mapreduce_arrow,
    start_mapreduce_job,
)
from multi_threaded_mapreduce_framework_spark.operators.compact import (
    CompactionStats,
    compact_parquet_dir,
)
from multi_threaded_mapreduce_framework_spark.operators.observe import (
    observed_filter,
    observed_quality_gates,
)

__all__ = [
    "CompactionStats",
    "compact_parquet_dir",
    "JobHandle",
    "JobState",
    "Stage",
    "run_mapreduce",
    "run_mapreduce_arrow",
    "start_mapreduce_job",
    "observed_filter",
    "observed_quality_gates",
]
