"""Declared query registry (SURVEY.md §2.3).

Every engine capability that the verify driver checks is registered here
as a ``Query``: a Spark DataFrame builder plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. Conventions (FIXTURES.md):

- every computed/aggregate column is explicitly aliased, with the SAME
  name on the Spark and oracle sides;
- float aggregates are rounded (2 dp; cosine scores 4 dp) on both sides;
- any top-k carries a deterministic total order (tiebreak on the table's
  unique key);
- results are unordered bags — no trailing orderBy except inside top-k.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import (order = declared order).
_QUERY_MODULES = (
    "multi_threaded_mapreduce_framework_spark.queries.t0",
    "multi_threaded_mapreduce_framework_spark.queries.relational",
    "multi_threaded_mapreduce_framework_spark.queries.t2_text",
    "multi_threaded_mapreduce_framework_spark.queries.t2_vector",
    "multi_threaded_mapreduce_framework_spark.queries.pipeline",
    "multi_threaded_mapreduce_framework_spark.queries.t2_dedup",
    "multi_threaded_mapreduce_framework_spark.queries.relational2",
    "multi_threaded_mapreduce_framework_spark.queries.tpch",
    "multi_threaded_mapreduce_framework_spark.queries.tpch2",
    "multi_threaded_mapreduce_framework_spark.queries.t2_corpus",
    "multi_threaded_mapreduce_framework_spark.queries.t2_join",
    "multi_threaded_mapreduce_framework_spark.queries.tpch3",
    "multi_threaded_mapreduce_framework_spark.queries.relational3",
    "multi_threaded_mapreduce_framework_spark.queries.relational4",
)


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None -> driver rows-only check
    tier: str = "T1"
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tier: str = "T1", doc: str = ""):
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tier, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB oracle SQL (SQL-expressible only)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
