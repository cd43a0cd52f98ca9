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
    "multi_threaded_mapreduce_framework_spark.queries.t2_train",
    "multi_threaded_mapreduce_framework_spark.queries.t2_scale",
    "multi_threaded_mapreduce_framework_spark.queries.t2_assoc",
    "multi_threaded_mapreduce_framework_spark.queries.t2_recon",
    "multi_threaded_mapreduce_framework_spark.queries.t2_bitmap",
    "multi_threaded_mapreduce_framework_spark.queries.t2_audit",
    "multi_threaded_mapreduce_framework_spark.queries.t2_multimodal",
    "multi_threaded_mapreduce_framework_spark.queries.t2_streamq",
    "multi_threaded_mapreduce_framework_spark.queries.t2_curate",
    "multi_threaded_mapreduce_framework_spark.queries.t2_spark4",
    "multi_threaded_mapreduce_framework_spark.queries.t2_pretrain",
    "multi_threaded_mapreduce_framework_spark.queries.t2_retrieval",
    "multi_threaded_mapreduce_framework_spark.queries.t2_loader",
    "multi_threaded_mapreduce_framework_spark.queries.t2_audit2",
    "multi_threaded_mapreduce_framework_spark.queries.t2_r7",
    "multi_threaded_mapreduce_framework_spark.queries.t2_r8",
)


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None -> driver rows-only check
    tier: str = "T1"
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Driver-check rotation (VERDICT.md r06 "Next round" item 1): the verify
# driver records correctness rows for a bounded window of entries in
# declared order (50 per round, observed).  Cumulative driver coverage:
# r01 drove q01-q49+q67; r02 q50-q110 minus q76-q85; r03 q76-q85 + q88
# + q56 + q111-q126 + q01-q22; r04 the q127-q171 debuts +
# q23/q24/q94/q98/q102; r05 the q50-q75/q86-q110 bands + q25-q28 +
# q172; r06 q173-q222; r07 q223-q229 + q217(renamed) + q29-q49/q67
# + the 6 r7 debuts + q76-q85/q88/q56/q111/q112 (50 rows, 0 failures).
# Round-8 priority, as the r7 verdict sequenced it (item 3): (1) this
# round's debuts (never driven); (2) the 36 names last driven r03
# (q113-q126 + q01-q22); (3) the r05 band fills the window tail; (4)
# the r04/r05 remainder via registration order.  The full set is
# re-proven locally each session via tools/check_oracle.py at sf0.01.
_DRIVER_PRIORITY = (
    # --- round-8 debuts (never driven) lead the window ---
    "q231_tws_liststate_lastk",
    "q237_tws_mapstate_census",
    "q238_k_anonymity_census",
    "q239_matryoshka_truncation",
    "q240_optimize_compaction_census",
    "q241_pipe_syntax_census",
    "q242_tws_initial_state",
    "q243_jaccard_threshold_curve",
    "q244_stream_dedup_readback",
    "q245_l_diversity_census",
    "q246_packing_efficiency_curve",
    # --- last driver row r03: the 36 remaining stale rows (the r7
    #     window consumed q76-q85/q88/q56/q111/q112 off this band) ---
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
    "q01_wordcount",
    "q02_charcount",
    "q03_grouped_sum",
    "q04_user_event_stats",
    "q05_filter_project",
    "q06_join_agg",
    "q07_join_chain",
    "q08_left_join",
    "q09_semi_join",
    "q10_anti_join",
    "q11_topk",
    "q12_distinct",
    "q13_count_distinct",
    "q14_union",
    "q15_intersect",
    "q16_except",
    "q17_window_rank",
    "q18_window_running",
    "q19_rollup",
    "q20_string_funcs",
    "q21_date_funcs",
    "q22_json_extract",
    # --- last driver row r05 (freshest bulk): the q50-q75 band fills
    #     the 50-row window tail; q86-q110 / r04 names follow in
    #     registration order via _ordered ---
    "q50_mapreduce_wordcount",
    "q51_tpch_q1",
    "q52_tpch_q3",
    "q53_tpch_q5",
    "q54_tpch_q10",
    "q55_approx_count_distinct",
    "q57_date_arith",
    "q58_string_funcs2",
    "q59_window_range_frame",
    "q60_min_max_by",
    "q61_deterministic_split",
    "q62_tfidf_top_terms",
    "q63_event_transitions",
    "q64_tpch_q7",
    "q65_tpch_q16",
    "q66_tpch_q2",
    "q68_longest_streak",
    "q69_regr_slope",
    "q70_asof_join",
    "q71_interval_join",
    "q72_tpch_q6",
    "q73_tpch_q4",
    "q74_tpch_q14",
    "q75_tpch_q18",
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
