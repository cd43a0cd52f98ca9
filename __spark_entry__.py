"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (q01 wordcount — the
reference sample client's workload family) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full declared inventory from
``multi_threaded_mapreduce_framework_spark.queries`` (SURVEY.md §2.3).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_threaded_mapreduce_framework_spark.queries import registry as _registry
from multi_threaded_mapreduce_framework_spark.session import ensure_session_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_confs(spark)
    return _registry.queries()["q01_wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted => rows-only check)."""
    return _registry.oracle_sql()
