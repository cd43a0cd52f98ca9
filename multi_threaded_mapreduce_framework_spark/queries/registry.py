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
    "multi_threaded_mapreduce_framework_spark.queries.t2_struct",
)


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None -> driver rows-only check
    tier: str = "T1"
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Driver-check rotation (VERDICT.md r03 "Next round" item 1): the verify
# driver records correctness rows for a bounded window of entries in
# declared order (~50 per round).  Cumulative driver coverage: r01 drove
# q01-q49+q67, r02 drove q50-q110 minus q76-q85, r03 drove q76-q85 +
# q88 + q56 + q111-q126 + q01-q22.  Round-4 priority: (1) every query
# NEW this round (q127-q171 — debut rows; q153-q171 are the late-
# session band and lead), (2) queries MODIFIED this round (q35 is in
# the r01 band below; q94/q98/q102), (3) the oldest stale rows
# (q23-q49+q67, r01-only) as far as the ~50 window reaches.
# q50-q75 then q86-q110 (r02 rows) queue for the round-5 window.  The
# full 171-query set was re-proven green locally against the round-4
# fixtures at BOTH sf0.01 and sf0.1 via tools/check_oracle.py in its
# final committed form (ALL OK end-of-session; q171 rows-only by
# contract).  Any
# new query is inserted at the TOP on creation so it gets a driver row
# in its debut round.
_DRIVER_PRIORITY = (
    # --- new in round 4 (late session): debut driver rows ---
    "q153_bitmap_distinct",
    "q154_global_ordinal",
    "q155_deletion_neighbors",
    "q156_topk_pushdown",
    "q157_novelty_score",
    "q158_watermark_replay",
    "q159_weighted_median",
    "q160_lang_overlap",
    "q161_sorted_neighborhood",
    "q162_bitmap_set_algebra",
    "q163_bitmap_distinct_rollup",
    "q164_bitmap_retention",
    "q165_bitmap_rolling_wau",
    "q166_session_window",
    "q167_linear_interpolate",
    "q168_benford_audit",
    "q169_cusum_changepoint",
    "q170_pareto_skyline",
    "q171_multimodal_audio",
    # --- new in round 4: debut driver rows ---
    "q127_vocab_ids",
    "q128_train_holdout_leakage",
    "q129_skipgram_pairs",
    "q130_sequence_packing",
    "q131_kmeans_update",
    "q132_quality_gates",
    "q133_embedding_outliers",
    "q134_bm25_topk",
    "q135_heavy_hitter_shingles",
    "q136_bloom_prefilter_join",
    "q137_zorder_skipping",
    "q138_bpe_pair_counts",
    "q139_pps_systematic_sample",
    "q140_char_entropy",
    "q141_mad_outliers",
    "q142_copurchase_pairs",
    "q143_pmi_bigrams",
    "q144_incremental_agg_merge",
    "q145_time_weighted_avg",
    "q146_snapshot_diff_merkle",
    "q147_survivorship_merge",
    "q148_tokenize_to_ids",
    "q149_skew_audit",
    "q150_triangle_count",
    "q151_session_attribution",
    "q152_quantile_normalize",
    # --- modified in round 4 (q35 below too): re-prove under a fresh
    #     driver row ---
    "q94_dedup_clusters",
    "q98_contamination",
    "q102_cc_star",
    # --- driver row from r01 only (oldest stale) ---
    "q23_sessionize",
    "q24_window_tumbling",
    "q25_exact_dedup",
    "q26_ngram_bigrams",
    "q27_jaccard_neardup",
    "q28_cosine_topk",
    "q29_knn_label",
    "q30_text_stats",
    "q31_quality_score",
    "q32_token_stats",
    "q33_langid",
    "q34_fingerprint",
    "q35_minhash_lsh",
    "q36_simhash",
    "q37_embedding_neardup",
    "q38_ann_lsh_bucketed",
    "q39_ivf_assign",
    "q40_cube",
    "q41_grouping_sets",
    "q42_full_outer",
    "q43_percentiles",
    "q44_stats_agg",
    "q45_pivot",
    "q46_exists_subquery",
    "q47_scalar_subquery",
    "q48_array_collect",
    "q49_ntile",
    "q67_simhash_hamming_pairs",
    # --- driver row from r02 (q55/q56 rows-only by contract) ---
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
    # --- driver row from r02, queued for the round-5 window ---
    "q86_tpch_q8",
    "q87_tpch_q9",
    "q89_tpch_q13",
    "q90_tpch_q15",
    "q91_tpch_q17",
    "q92_tpch_q20",
    "q93_tpch_q21",
    "q95_corpus_select",
    "q96_repetition_stats",
    "q97_trigram_lm",
    "q99_stratified_sample",
    "q100_pii_redact",
    "q101_repeated_passages",
    "q103_stratum_topk_sample",
    "q104_length_histogram",
    "q105_funnel_conversion",
    "q106_variant_json",
    "q107_retention_cohorts",
    "q108_mixture_allocation",
    "q109_rolling_wau",
    "q110_unpivot",
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
