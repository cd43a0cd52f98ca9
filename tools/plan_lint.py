"""Plan-antipattern lint across every registered query.

The plan-shape snapshot (tests/plan_snapshot.json) pins each query's
shape against DRIFT; this tool audits all plans against ABSOLUTE
antipattern rules — the scale-killers a 100 TB deployment cannot
tolerate — and prints one line per finding (or a clean bill).  Rules:

- CARTESIAN: a CartesianProduct node (unbounded pairwise work).
- BNLJ: a BroadcastNestedLoopJoin that is NOT a deliberate tiny-side
  broadcast (allowlisted where the query broadcasts a 1-row scalar or
  a bounded census — each allowlist entry names why).
- ROW-UDF: row-at-a-time Python evaluation (BatchEvalPython) — every
  Python kernel in this engine must be Arrow-batched (ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas...).
- GLOBAL-WINDOW: a window over SinglePartition (the whole dataset
  through one task) — allowlisted only for queries DECLARED as
  exact-total-order baselines with a scale-ready sibling.
- GLOBAL-SORT-NO-LIMIT: a global Sort not under TakeOrderedAndProject
  and not feeding a range-partitioned write (total sort of the corpus).

Exit code 1 on any non-allowlisted finding, so it can gate CI.

Usage: python tools/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_threaded_mapreduce_framework_spark.plans import executed_plan
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.session import get_spark

# name -> {rule: reason} deliberate, documented exceptions
ALLOW: dict[str, dict[str, str]] = {
    # global-order baselines, declared with scale-ready siblings
    "q49_ntile": {
        "GLOBAL-WINDOW": "exact-rank reference; q111 is the declared scale path"
    },
    "q17_window_rank": {
        "GLOBAL-WINDOW": "rank over a GROUPED tiny aggregate (suppliers per "
        "nation), not the corpus — partition count bounded by nations"
    },
    "q83_window_distribution": {
        "GLOBAL-WINDOW": "cume_dist/percent_rank over the 5-row priority "
        "census, not the fact table"
    },
    "q154_global_ordinal": {
        "GLOBAL-WINDOW": "window over the BUCKET HISTOGRAM (domain-bounded), "
        "the corpus rides bucket-partitioned windows"
    },
    "q158_watermark_replay": {
        "GLOBAL-WINDOW": "cumulative window over per-hour bucket maxes "
        "(bounded by the time range), the corpus side is bucket-partitioned"
    },
    "q159_weighted_median": {
        "GLOBAL-WINDOW": "prefix sums over the value-domain histogram "
        "(domain-bounded), not raw rows"
    },
    "q170_pareto_skyline": {
        "GLOBAL-WINDOW": "suffix-min over the vocabulary histogram "
        "(domain-bounded)"
    },
    "q104_length_histogram": {
        "GLOBAL-WINDOW": "cumulative share over the ~40-row histogram"
    },
    "q141_mad_outliers": {
        "GLOBAL-WINDOW": "median-of-histogram prefix window (domain-bounded)"
    },
    "q152_quantile_normalize": {
        "GLOBAL-WINDOW": "rank windows ride the per-feature partitioning; "
        "flagged only because feature count is small in the fixture"
    },
    "q168_benford_audit": {
        "GLOBAL-WINDOW": "census join-back window over priorities x 9 digits"
    },
    "q146_snapshot_diff_merkle": {
        "GLOBAL-WINDOW": "window over the bucket-level digest table "
        "(n_buckets rows, corpus hashes ride partial aggs)"
    },
    "q113_ivf_probe_search": {
        "BNLJ": "probe row (1) broadcast against nprobe cell ids — bounded"
    },
    "q28_cosine_topk": {"BNLJ": "single probe vector broadcast (1 row)"},
    "q29_knn_label": {"BNLJ": "single probe vector broadcast (1 row)"},
    "q47_scalar_subquery": {"BNLJ": "scalar aggregate (1 row) broadcast"},
    # scalar / bounded-side broadcast joins (no equi key -> Spark plans
    # BNLJ; the build side is 1 row or a domain-bounded table)
    "q62_tfidf_top_terms": {"BNLJ": "total-doc-count scalar (1 row) for IDF"},
    "q39_ivf_assign": {"BNLJ": "centroid table (k=16 rows) broadcast"},
    "q193_semantic_dedup": {
        "BNLJ": "centroid table (k=16 rows) broadcast (q39's assignment law)"
    },
    "q77_tpch_q11": {"BNLJ": "Q11's value-fraction threshold scalar (1 row)"},
    "q78_tpch_q22": {"BNLJ": "Q22's avg-acctbal scalar (1 row)"},
    "q111_global_quantile_buckets": {
        "BNLJ": "total-count scalar (1 row) for bucket targets",
        "GLOBAL-WINDOW": "cumulative window over the HISTOGRAM of bounded "
        "value domain, then broadcast cut points",
    },
    "q119_data_quality_audit": {"BNLJ": "1-row per-check metric union joins"},
    "q131_kmeans_update": {"BNLJ": "movement-norm scalar join (1 row/centroid set)"},
    "q133_embedding_outliers": {"BNLJ": "global mean/std stats scalar (1 row)"},
    "q134_bm25_topk": {"BNLJ": "corpus stats scalar (N, avgdl — 1 row)"},
    "q135_heavy_hitter_shingles": {"BNLJ": "total-count scalar (1 row) threshold"},
    "q227_class_separability": {
        "BNLJ": "centroid-array table (|labels| rows) broadcast cross "
        "join — the r12 zero-explode cosine plan"
    },
    "q136_bloom_prefilter_join": {
        "BNLJ": "the Bloom bitset itself (1 row) broadcast to the probe scan"
    },
    "q139_pps_systematic_sample": {
        "BNLJ": "total-weight scalar (1 row)",
        "GLOBAL-WINDOW": "two-level prefix scan: this window runs over "
        "per-bucket partials (bounded), corpus side is bucket-partitioned",
    },
    "q143_pmi_bigrams": {"BNLJ": "ntok/nbig scalars (1 row each)"},
    "q206_dsir_importance": {
        "BNLJ": "vocab/t_all and t_en scalars (1 row each) for smoothing"
    },
    "q228_dataset_card": {
        "BNLJ": "1-row dup-census joined to the 1-row card aggregate"
    },
    "q229_conversion_survival": {
        "BNLJ": "1-row cohort total broadcast into the 14-row day grid",
        "GLOBAL-WINDOW": "at-risk running sum over the FIXED 14-row day "
        "grid (bounded by the horizon, not the data)",
    },
    "q260_t_closeness_census": {
        "BNLJ": "1-row totals + 3-row t-grid broadcast into the "
        "quasi-id-domain-bounded group census (q238/q245's class)"
    },
    "q261_vocab_coverage_curve": {
        "BNLJ": "1-row totals + 3-row V-grid broadcast into the "
        "vocab-bounded rank relation (q243's grid class)",
        "GLOBAL-WINDOW": "rank + running sum over the VOCABULARY census "
        "(bounded by distinct tokens via Heaps' law, not corpus rows — "
        "q111's bounded class; q187-histogram route is the documented "
        "fallback)",
    },
    "q253_eval_apportionment": {
        "BNLJ": "1-row total + 1-row leftover broadcast into the "
        "|langs|-row stratum census (q62's scalar class)",
        "GLOBAL-WINDOW": "remainder rank over the |langs|-row DOMAIN "
        "relation (post-aggregate, q234's bounded class)",
    },
    "q254_langid_agreement_kappa": {
        "BNLJ": "1-row chance-agreement scalar joined to the 1-row "
        "totals (label-domain-bounded inputs; q228's card class)"
    },
    "q257_temperature_mixture": {
        "BNLJ": "1-row token/weight totals broadcast into the "
        "|langs|-row census (q62's scalar class)"
    },
    "q245_l_diversity_census": {
        "BNLJ": "1-row total + 2-row l-grid broadcast into the "
        "quasi-id-domain-bounded group census (q238's class)"
    },
    "q246_packing_efficiency_curve": {
        "BNLJ": "3-row context-length grid broadcast into the per-doc "
        "relation (q243's grid class; the window pass runs once)"
    },
    "q243_jaccard_threshold_curve": {
        "BNLJ": "3-row threshold grid broadcast into the size-band-bounded "
        "pair relation (q225/q238's grid class)"
    },
    "q249_banded_threshold_curve": {
        "BNLJ": "3-row threshold grid broadcast into the LSH-candidate-"
        "bounded verified pair relation (q243's grid class on q35's "
        "banded universe)"
    },
    "q255_lsh_design_curve": {
        "BNLJ": "5-row (bands, rows) design grid broadcast into the "
        "<=701-row j_milli histogram (q243's grid class; visible since "
        "the r11 let-binding made the plan lazy end to end)"
    },
    "q238_k_anonymity_census": {
        "BNLJ": "1-row total + 3-row k-threshold grid broadcast into the "
        "quasi-id-domain-bounded group census (q225's depth-grid class)"
    },
    "q239_matryoshka_truncation": {
        "BNLJ": "pinned probe table (5 rows) broadcast into the scan "
        "(q210/q28's probe-broadcast law)"
    },
    "q234_doremi_step": {
        "BNLJ": "1-row weight normalizer (sum of 5 domain ew) broadcast "
        "into the 5-row domain table (q62's scalar class)",
        "GLOBAL-WINDOW": "max-loss shift over the |langs|-row DOMAIN "
        "relation (post-aggregate, q111's bounded class)",
    },
    "q236_rrf_fusion": {
        "BNLJ": "200x200 full outer fusion join of two TakeOrdered "
        "candidate lists — both sides LIMIT-bounded, never corpus-sized",
        "GLOBAL-WINDOW": "rank over the TakeOrdered TOP-200 subsets — "
        "size pinned by the LIMIT upstream (the q111/q225 bounded class)",
    },
    "q225_scorer_agreement": {
        "BNLJ": "the 3-row depth grid broadcast",
        "GLOBAL-WINDOW": "rank over the TakeOrdered TOP-100 subset — "
        "size pinned by the LIMIT upstream (q111's bounded class); plus "
        "the DSIR vocabulary-totals window (q206's r12 class)",
    },
    "q206_dsir_importance": {
        "GLOBAL-WINDOW": "corpus totals read off the AGGREGATED vocabulary "
        "relation (q127's domain-bounded class) — replaced two "
        "re-exploding scalar subtrees (r12)"
    },
    "q219_source_embedding_drift": {
        "BNLJ": "global-norm scalar (1 row) broadcast into the cosine fold"
    },
    "q214_embedding_diversity": {
        "BNLJ": "centroid table (k=8 rows) broadcast (q39's assignment law)"
    },
    "q210_ann_recall_census": {
        "BNLJ": "pinned probe table (5 rows) broadcast to the exact leg "
        "(q28's probe-broadcast law)"
    },
    "q211_source_kl_drift": {
        "BNLJ": "per-source census (|sources| rows) + vocab/t_all scalar "
        "broadcast into the vocabulary grid"
    },
    "q207_mixture_epochs": {
        "BNLJ": "grand-total token scalar (1 row) into the 5-row mix table"
    },
    "q150_triangle_count": {"BNLJ": "3 one-row metric joins (nv x ne x tri)"},
    "q165_bitmap_rolling_wau": {
        "BNLJ": "day-grid range join over |days| x words/day — both "
        "domain-bounded (never event-sized)"
    },
    "q160_lang_overlap": {
        "BNLJ": "lang-pair x 2^|langs| mask census join — both bounded",
        "GLOBAL-WINDOW": "row_number over the distinct-language table "
        "(|langs| rows)",
    },
    "q169_cusum_changepoint": {
        "BNLJ": "day-mean scalar (1 row)",
        "GLOBAL-WINDOW": "CUSUM prefix over the DAY domain (bounded by the "
        "time range, not the data)",
    },
    "q108_mixture_allocation": {
        "GLOBAL-WINDOW": "largest-remainder ranking over the strata table "
        "(#strata rows)"
    },
    "q127_vocab_ids": {
        "GLOBAL-WINDOW": "total-order ids over the AGGREGATED vocabulary "
        "(10^4-10^6 rows at any corpus size; docstring-documented)"
    },
    "q176_interval_sweep_concurrency": {
        "BNLJ": "max-concurrency + interval-count scalars (1 row each)",
        "GLOBAL-WINDOW": "cumulative window over per-hour bucket totals "
        "(bounded by the time range); the point stream rides "
        "bucket-partitioned windows",
    },
}


def lint(name: str, plan: str) -> list[tuple[str, str]]:
    findings = []
    final = plan.split("== Initial Plan ==")[0]
    if "CartesianProduct" in final:
        findings.append(("CARTESIAN", "CartesianProduct node in final plan"))
    if "BroadcastNestedLoopJoin" in final:
        findings.append(("BNLJ", "BroadcastNestedLoopJoin in final plan"))
    if re.search(r"\bBatchEvalPython\b", final):
        findings.append(("ROW-UDF", "row-at-a-time Python UDF (BatchEvalPython)"))
    if re.search(r"Window.*\n.*SinglePartition", final) or (
        "Window" in final and "Exchange SinglePartition" in final
    ):
        findings.append(("GLOBAL-WINDOW", "window over Exchange SinglePartition"))
    # global Sort not under a TakeOrderedAndProject / limit
    if (
        re.search(r"Exchange rangepartitioning", final)
        and "TakeOrderedAndProject" not in final
        and "write" not in name
    ):
        findings.append(
            ("GLOBAL-SORT-NO-LIMIT", "range-partitioned global sort without top-k")
        )
    allowed = ALLOW.get(name, {})
    return [(rule, msg) for rule, msg in findings if rule not in allowed]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("plan-lint", shuffle_partitions=4)
    qs = all_queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}
    bad = 0
    t0 = time.time()
    for name, q in qs.items():
        try:
            plan = executed_plan(q.builder(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        findings = lint(name, plan)
        if findings:
            bad += 1
            for rule, msg in findings:
                print(f"{name:32s} {rule:20s} {msg}")
    n = len(qs)
    print(f"\n{'LINT CLEAN' if bad == 0 else f'{bad} queries flagged'} "
          f"({n} plans, {time.time()-t0:.0f}s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
