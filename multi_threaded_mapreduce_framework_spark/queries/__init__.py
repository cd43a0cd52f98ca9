from multi_threaded_mapreduce_framework_spark.queries.registry import (
    Query,
    all_queries,
    oracle_sql,
    queries,
    register,
)

__all__ = ["Query", "all_queries", "oracle_sql", "queries", "register"]
