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
    "multi_threaded_mapreduce_framework_spark.queries.tpch4",
    "multi_threaded_mapreduce_framework_spark.queries.t2_cluster",
    "multi_threaded_mapreduce_framework_spark.queries.t2_mining",
    "multi_threaded_mapreduce_framework_spark.queries.layout",
)


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None -> driver rows-only check
    tier: str = "T1"
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Driver-check rotation (VERDICT.md r02 item 2): the verify driver records
# correctness rows for a bounded window of entries in declared order (~50
# per round).  Rounds 1+2 together drove q01-q49+q67 (r01) and q50-q110
# minus q76-q85 (r02).  Round-3 order therefore puts first the 10 queries
# that have NEVER had a driver row (q76-q85, judge-local only), then the
# two just-fixed red rows (q88 hash-type artifact, q56 canonicalizer
# crash), then new round-3 queries (q111+ register after the priority
# list and sort before the green backlog via _ordered), then the oldest
# driver-green band (q01-q49, checked in r01 only) for re-confirmation.
_DRIVER_PRIORITY = (
    # --- never driver-checked (judge-local green in r02) ---
    "q76_tpch_q19",
    "q77_tpch_q11",
    "q78_tpch_q22",
    "q79_corr_covar",
    "q80_conditional_agg",
    "q81_vector_minmax",
    "q82_gap_fill",
    "q83_window_distribution",
    "q84_edit_distance_pairs",
    "q85_chunk_documents",
    # --- red in r02, fixed this round ---
    "q88_tpch_q12",
    "q56_approx_percentile",
    # --- round-3 additions (each new query is appended here on creation
    #     so it gets a driver row in its debut round) ---
    "q111_global_quantile_buckets",
    "q112_bucketed_join",
    "q113_ivf_probe_search",
    "q114_salted_agg",
    "q115_partition_pruned_scan",
    "q116_lm_doc_score",
    "q117_incremental_dedup",
    "q118_pagerank",
    "q119_data_quality_audit",
    "q120_ann_partition_pruned",
    "q121_map_functions",
    "q122_lateral_topk",
    "q123_scd2_cdc",
    "q124_asof_pandas",
    "q125_window_sliding",
    "q126_prefix_filter_join",
)


def _ordered(reg: dict[str, Query]) -> dict[str, Query]:
    """Priority names first (their listed order), then the rest in
    registration order.  Names in _DRIVER_PRIORITY that are not (yet)
    registered are ignored."""
    out: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in reg:
            out[name] = reg[name]
    for name, q in reg.items():
        if name not in out:
            out[name] = q
    return out


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
    return _ordered(_REGISTRY)


def queries() -> dict[str, Builder]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB oracle SQL (SQL-expressible only)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
