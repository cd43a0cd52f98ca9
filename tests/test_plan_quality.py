"""Plan-quality assertions: the properties that decide 100 TB cost.

Each test pins a scale property of a query's physical plan — predicate
pushdown, column pruning, broadcast of fixed-size dims, map-side partial
aggregation, shuffle counts — so an innocent refactor can't silently
turn a pruned broadcast plan into a full-scan shuffle plan.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.plans import (
    executed_plan,
    has_broadcast_join,
    has_partial_aggregate,
    num_exchanges,
    plan_shape,
    pushed_filters,
    read_schema_columns,
)
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = all_queries()


def test_q05_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q05_filter_project"].builder(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed, pushed
    # 4-column projection must read exactly those 4 columns
    assert read_schema_columns(df) == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    }


def test_q01_reads_only_text(spark, sf_dir):
    df = QUERIES["q01_wordcount"].builder(spark, sf_dir)
    assert read_schema_columns(df) == {"text"}


def test_q03_partial_aggregation(spark, sf_dir):
    df = QUERIES["q03_grouped_sum"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    assert num_exchanges(df) == 1  # exactly the group-by shuffle


def test_q07_dims_broadcast(spark, sf_dir):
    df = QUERIES["q07_join_chain"].builder(spark, sf_dir)
    assert has_broadcast_join(df)
    # customer side never shuffles before the joins: the only exchange
    # is the final groupBy
    assert num_exchanges(df) == 1


def test_q35_no_allpairs_join(spark, sf_dir):
    """The LSH query must join on (band, key) equality — an equi-join,
    never a nested-loop over all pairs."""
    df = QUERIES["q35_minhash_lsh"].builder(spark, sf_dir)
    from multi_threaded_mapreduce_framework_spark.plans import executed_plan

    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q38_probe_is_broadcast(spark, sf_dir):
    df = QUERIES["q38_ann_lsh_bucketed"].builder(spark, sf_dir)
    assert has_broadcast_join(df)


def test_filter_before_join_in_q46(spark, sf_dir):
    """The o_totalprice predicate must sit under the join (pushed to the
    orders scan), not above it."""
    df = QUERIES["q46_exists_subquery"].builder(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "o_totalprice" in pushed, pushed


def test_events_tumbling_single_shuffle(spark, sf_dir):
    df = QUERIES["q24_window_tumbling"].builder(spark, sf_dir)
    assert num_exchanges(df) == 1
    assert has_partial_aggregate(df)


with open(os.path.join(os.path.dirname(__file__), "plan_snapshot.json")) as _f:
    PLAN_SNAPSHOT = json.load(_f)


@pytest.mark.parametrize("name", sorted(PLAN_SNAPSHOT))
def test_plan_shape_snapshot(spark, sf_dir, name):
    """Every query's plan shape (exchange count, join strategies,
    partial-agg presence) is pinned against tests/plan_snapshot.json.
    A refactor that adds a shuffle or downgrades a broadcast join to a
    shuffled one fails here; regenerate deliberately with
    `python tools/snapshot_plans.py` when a change is intended."""
    # a query built earlier in the session may have left a persist()
    # registered (q67's diamond): the CacheManager would then rewrite
    # this build's subtree to InMemoryTableScan and change its shape
    spark.catalog.clearCache()
    df = QUERIES[name].builder(spark, sf_dir)
    assert plan_shape(df) == PLAN_SNAPSHOT[name], name


def test_snapshot_covers_every_query():
    assert sorted(PLAN_SNAPSHOT) == sorted(QUERIES)


def test_q64_double_nation_broadcast(spark, sf_dir):
    """Q7's signature: nation joined twice (two roles), both broadcast;
    the fact side shuffles only for its joins/agg, never for a dim."""
    df = QUERIES["q64_tpch_q7"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_q65_anti_join_is_broadcast(spark, sf_dir):
    df = QUERIES["q65_tpch_q16"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q67_band_join_no_nested_loop(spark, sf_dir):
    df = QUERIES["q67_simhash_hamming_pairs"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q70_asof_is_single_shuffle_no_join(spark, sf_dir):
    """The as-of join compiles to union + window: exactly one exchange
    (the per-user repartition) and NO join operator at all — the
    skew-proof sort-merge as-of form."""
    df = QUERIES["q70_asof_join"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert num_exchanges(df) == 1
    assert "Join" not in plan


def test_q71_interval_join_is_equi(spark, sf_dir):
    """The bucketed decomposition must surface the equi keys to the
    planner: a hash join with the range as residual condition, never an
    inequality nested loop."""
    df = QUERIES["q71_interval_join"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_narrow_scan_for_embeddings(spark, sf_dir):
    """q28 scores against one probe: embeddings scan reads only vec_id +
    embedding (+label for q29), and the probe row is broadcast."""
    df = QUERIES["q28_cosine_topk"].builder(spark, sf_dir)
    assert has_broadcast_join(df)
    cols = read_schema_columns(df)
    assert "vec_id" in cols and "embedding" in cols


def test_q68_native_no_python(spark, sf_dir):
    """The declared q68 is pure JVM gaps-and-islands (window + two
    aggregates): no PythonUDF/ArrowEvalPython node anywhere, one
    exchange, map-side partial aggregation."""
    df = QUERIES["q68_longest_streak"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Python" not in plan
    assert num_exchanges(df) == 1
    assert has_partial_aggregate(df)


def test_q68_pandas_alternate_parity(spark, sf_dir):
    """The applyInPandas custom-sequence-operator alternate computes the
    same bag as the declared native window form."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_corpus import (
        longest_streak_pandas,
    )

    native = QUERIES["q68_longest_streak"].builder(spark, sf_dir)
    alt = longest_streak_pandas(spark, sf_dir)
    key = lambda r: (r["user_id"], r["longest_streak"], r["n_runs"])  # noqa: E731
    assert sorted(map(key, native.collect())) == sorted(map(key, alt.collect()))


def test_q37_no_driver_materialization(spark, sf_dir):
    """Blocked all-pairs GEMM is fully distributed: building the
    DataFrame must launch zero Spark jobs (round 1 collect()ed the
    corpus to the driver at build time), and the plan is one shuffle
    into a grouped-pandas kernel with no join or broadcast."""
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    df = QUERIES["q37_embedding_neardup"].builder(spark, sf_dir)
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    # every builder costs exactly one job (parquet footer/schema read);
    # the round-1 driver collect() was a second, corpus-sized job
    assert jobs_after - jobs_before <= 1, "build phase ran extra Spark jobs (driver collect?)"
    plan = executed_plan(df)
    assert "Join" not in plan and "Broadcast" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert num_exchanges(df) == 1


def test_runtime_bloom_filter_on_selective_fact_join(spark, sf_dir):
    """Runtime row-level filtering: a selective filter on one fact side
    of a shuffled join should inject a bloom filter (might_contain) into
    the other side's scan, cutting shuffle volume before the join. The
    application-side size threshold (default 10GB) is lowered because
    the test fixture scan is tiny; a 100 TB fact scan passes the default
    threshold on its own."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        plan = executed_plan(j)
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_q53_semi_restricts_facts_before_join(spark, sf_dir):
    """q53's scale fix (VERDICT r02 item 3): customer AND supplier are
    broadcast-semi-joined against the ASIA nation-key set before the
    fact joins, so at 100 TB the c/o/li shuffles carry ASIA-only rows."""
    df = QUERIES["q53_tpch_q5"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("LeftSemi") >= 2, plan[:3000]


def test_q86_semi_restricts_customer(spark, sf_dir):
    df = QUERIES["q86_tpch_q8"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("LeftSemi") >= 1, plan[:3000]


def test_q112_bucketed_join_no_exchange(spark, sf_dir):
    """The declared bucketed-join query must join WITHOUT any exchange
    or sort between the scans and the join: the bucketed+sorted layout
    already co-locates and orders the keys. Broadcast is disabled so
    the layout — not a broadcast — is what avoids the shuffle."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["q112_bucketed_join"].builder(spark, sf_dir)
        plan = executed_plan(df)
        assert "SortMergeJoin" in plan, plan[:2000]
        # exactly one exchange: the final groupBy — never the join sides
        assert num_exchanges(df) == 1, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_q115_scan_is_partition_pruned(spark, sf_dir):
    """The declared partitioned-layout query must read ONE ship_year
    partition: the year filter appears as a PartitionFilter on the
    scan, not a post-scan Filter over all partitions."""
    df = QUERIES["q115_partition_pruned_scan"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "PartitionFilters" in plan, plan[:2000]
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_year" in m.group(1), m.group(0) if m else plan[:2000]


def test_q120_dynamic_partition_pruning(spark, sf_dir):
    """The bucket-partitioned ANN probe must prune partitions at
    runtime: the probe's bucket is only known after the broadcast side
    evaluates, so the scan's PartitionFilters must carry a
    DynamicPruningExpression (not a static filter, not a post-scan
    predicate over all buckets)."""
    df = QUERIES["q120_ann_partition_pruned"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_q117_probe_join_is_bucketed(spark, sf_dir):
    """Incremental dedup must join incoming x existing on (band, key)
    equality — never a nested loop over all cross pairs."""
    df = QUERIES["q117_incremental_dedup"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q117_band_join_is_narrow(spark, sf_dir):
    """The r5 verdict's one `weak` plan, fixed and pinned: the band
    join must carry only (band, key, doc_id) rows — the shingle arrays
    (`hs`) may NOT cross it (q35's docstring records the measured 64%
    regression when they did; shuffle width/doc ~ bands x |hs|).
    Verification joins back on doc_id AFTER candidate dedup."""
    from multi_threaded_mapreduce_framework_spark.plans.inspect import formatted_plan

    df = QUERIES["q117_incremental_dedup"].builder(spark, sf_dir)
    band_joins = [
        b
        for b in formatted_plan(df).split("\n\n")
        if "Join" in b.split("\n")[0] and "band" in b
    ]
    assert band_joins, "band join node not found in formatted plan"
    for b in band_joins:
        assert "hs" not in b, f"shingle column crosses the band join:\n{b}"


def test_q116_model_join_no_cartesian(spark, sf_dir):
    """The LM-score join (doc trigrams x model counts) is an equi-join
    on (ctx, nxt) with partial aggregation below the doc_id shuffle."""
    df = QUERIES["q116_lm_doc_score"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert has_partial_aggregate(df)


def test_q129_skipgram_single_shuffle(spark, sf_dir):
    """Skip-gram pair extraction is pure in-row expansion: the ONLY
    exchange is the (center, context) count, with map-side combine."""
    df = QUERIES["q129_skipgram_pairs"].builder(spark, sf_dir)
    assert num_exchanges(df) == 1
    assert has_partial_aggregate(df)


def test_q127_vocab_window_sees_aggregate_only(spark, sf_dir):
    """The vocab-id window is total-order (single partition) by design;
    the plan is only scale-sane if the corpus-scale token count
    aggregates BELOW it — partial agg present, and the window input is
    the post-aggregate vocab, never raw tokens."""
    df = QUERIES["q127_vocab_ids"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    from multi_threaded_mapreduce_framework_spark.plans import executed_plan

    plan = executed_plan(df)
    # window must appear above the aggregate in the plan tree: the
    # aggregate node is listed as the window's descendant, so the text
    # order is Window ... HashAggregate
    assert plan.index("Window") < plan.index("HashAggregate"), plan[:2000]


def test_q128_leakage_no_cartesian(spark, sf_dir):
    """The holdout-vs-train hit test is an equi-(semi-)join on the
    shingle key — never a nested loop; per-doc re-agg keeps partial
    aggregation."""
    df = QUERIES["q128_train_holdout_leakage"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_partial_aggregate(df)


def test_q130_packing_single_shuffle(spark, sf_dir):
    """Window partition key and rollup key coincide: one exchange total."""
    df = QUERIES["q130_sequence_packing"].builder(spark, sf_dir)
    assert num_exchanges(df) == 1
    assert has_partial_aggregate(df)


def test_q131_centroids_broadcast(spark, sf_dir):
    """The 8-centroid scoring side must broadcast (corpus never
    shuffles for assignment); the mean aggregate keeps partial agg."""
    df = QUERIES["q131_kmeans_update"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Broadcast" in plan
    assert has_partial_aggregate(df)


def test_q132_gates_no_shuffle(spark, sf_dir):
    """The quality-gate report is a pure map-side pass: zero exchanges."""
    df = QUERIES["q132_quality_gates"].builder(spark, sf_dir)
    assert num_exchanges(df) == 0


def test_q133_stats_join_broadcast(spark, sf_dir):
    """Cluster stats (K rows) broadcast back to the assignment side; the
    corpus never shuffles for the z filter."""
    df = QUERIES["q133_embedding_outliers"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert has_partial_aggregate(df)


def test_q134_term_filter_before_shuffle(spark, sf_dir):
    """Only query-term occurrences shuffle: the isin filter sits under
    the tf aggregate, df broadcasts, and top-k is TakeOrdered (no
    global sort)."""
    df = QUERIES["q134_bm25_topk"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "TakeOrdered" in plan
    assert "BroadcastHashJoin" in plan
    assert has_partial_aggregate(df)


def test_q148_vocab_apply_is_broadcast(spark, sf_dir):
    """The encode step must broadcast the capped vocab under the
    tokenize explode — the corpus side shuffles only for the per-doc
    re-aggregation."""
    df = QUERIES["q148_tokenize_to_ids"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q149_windows_run_on_aggregated_keys(spark, sf_dir):
    """The rank/share windows must sit ABOVE the per-key count
    aggregates (domain-bounded input), and each table contributes one
    partial-agg pass."""
    df = QUERIES["q149_skew_audit"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    plan = executed_plan(df)
    assert "HashAggregate" in plan and "Window" in plan, plan


def test_q151_windows_share_one_user_shuffle(spark, sf_dir):
    """The lag, session-counter, and first-touch windows must all ride
    the user_id partitioning: exchanges = user_id window shuffle +
    (user, session) rollup reuse + the tiny final channel aggregate."""
    df = QUERIES["q151_session_attribution"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("Window") >= 2  # chained windows present
    assert num_exchanges(df) <= 3, executed_plan(df)


def test_q153_bitmap_words_partial_agg(spark, sf_dir):
    """The daily word layer must be a partial (map-side) aggregate —
    the whole point of the bitmap state is combinability — and the
    merge/count layers add no raw-data re-scan (3 exchanges total:
    daily words, cross-day merge, final census)."""
    df = QUERIES["q153_bitmap_distinct"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    assert num_exchanges(df) <= 3, executed_plan(df)
    # the expand trick countDistinct uses must NOT appear
    assert "Expand" not in executed_plan(df)


def test_q154_no_corpus_single_partition_window(spark, sf_dir):
    """The corpus-side window is partitioned by n_chars; only the
    histogram (domain-bounded) takes an unpartitioned window, and the
    offsets come back via broadcast."""
    df = QUERIES["q154_global_ordinal"].builder(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = executed_plan(df)
    # exactly one SinglePartition exchange: the histogram cumulative
    # window — never a second one for the corpus-side ranking
    assert plan.count("SinglePartition") == 1, plan


def test_q155_candidate_join_is_equi(spark, sf_dir):
    """The deletion-neighborhood join must be an equi-join on the
    variant key — never a nested loop over name pairs (that is the
    oracle's O(n^2) formulation, not ours)."""
    df = QUERIES["q155_deletion_neighbors"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q156_partial_topk_before_shuffle(spark, sf_dir):
    """The mapInPandas partial top-k must run under the single ranking
    exchange: survivors shuffle, the table does not."""
    df = QUERIES["q156_topk_pushdown"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "MapInPandas" in plan, plan
    assert num_exchanges(df) == 1, plan
    # partial stage feeds the exchange, not the other way around
    assert plan.index("MapInPandas") > plan.index("Exchange"), plan


def test_q157_no_doc_pair_join(spark, sf_dir):
    """Novelty routes through the shingle key domain: partial-agg min
    per shingle + equi join-back; no doc-to-doc comparison."""
    df = QUERIES["q157_novelty_score"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q158_prefix_scan_recombines_via_broadcast(spark, sf_dir):
    """The two-level prefix max: per-bucket window + tiny cumulative
    bucket table joined back by broadcast; the corpus never sees a
    SinglePartition window."""
    df = QUERIES["q158_watermark_replay"].builder(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = executed_plan(df)
    assert plan.count("SinglePartition") == 1, plan  # bucket table only


def test_q159_median_from_histogram(spark, sf_dir):
    """The weighted median must aggregate to the (flag, quantity)
    histogram first (partial agg), then window over the histogram —
    never sort raw rows."""
    df = QUERIES["q159_weighted_median"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    plan = executed_plan(df)
    assert "Window" in plan


def test_q160_single_vocab_shuffle(spark, sf_dir):
    """The only data-sized moves are the distinct + per-token mask
    aggregation; the pair/census algebra is broadcast-tiny."""
    df = QUERIES["q160_lang_overlap"].builder(spark, sf_dir)
    assert has_partial_aggregate(df)
    assert has_broadcast_join(df)


def test_q161_one_shuffle_no_self_join(spark, sf_dir):
    """Sorted-neighborhood adjacency: one window shuffle on the block
    key, a lag, and a filter — no join nodes, no SinglePartition
    window."""
    df = QUERIES["q161_sorted_neighborhood"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Join" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert num_exchanges(df) == 1, plan


def test_q162_no_expand_single_fact_shuffle(spark, sf_dir):
    """The set-algebra expression must evaluate over bitmap words: no
    countDistinct Expand, one fact-table exchange into the word layer
    (+ the 1-row final aggregate)."""
    df = QUERIES["q162_bitmap_set_algebra"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Expand" not in plan, plan
    assert has_partial_aggregate(df)
    assert num_exchanges(df) <= 2, plan


def test_q163_rollups_reuse_word_layer(spark, sf_dir):
    """Three granularities, no Expand anywhere: the raw-event shuffle
    happens once per branch at the finest granularity and every
    coarser count aggregates words, not events."""
    df = QUERIES["q163_bitmap_distinct_rollup"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Expand" not in plan, plan
    assert has_partial_aggregate(df)


def test_q164_retention_joins_word_layer(spark, sf_dir):
    """Retention must self-join the bitmap layer on (day, word index) —
    no Expand, no user-domain join, equi-join only."""
    df = QUERIES["q164_bitmap_retention"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert has_partial_aggregate(df)


def test_q165_rolling_or_over_word_grid(spark, sf_dir):
    """The 7-day OR must window over the word grid (no Expand, no
    event-level explode): one fact exchange into the layer, the rest
    domain-bounded."""
    df = QUERIES["q165_bitmap_rolling_wau"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Expand" not in plan, plan
    assert "Window" in plan, plan
    assert has_partial_aggregate(df)


def test_q166_single_user_shuffle_session_merge(spark, sf_dir):
    """The native session aggregate must ride one user_id exchange (the
    session merge is in-partition after the shuffle) plus the tiny
    rollup — never an Expand or a second corpus pass."""
    df = QUERIES["q166_session_window"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "Expand" not in plan, plan
    assert num_exchanges(df) <= 2, plan


def test_q167_fills_ride_user_shuffle(spark, sf_dir):
    """Both fill windows and the grid must share the user partitioning
    — no Expand, no corpus-global window."""
    df = QUERIES["q167_linear_interpolate"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "SinglePartition" not in plan, plan
    assert plan.count("Window") >= 1, plan


def test_q170_no_pairwise_dominance(spark, sf_dir):
    """The skyline must come from the histogram decomposition: no
    nested-loop/cartesian dominance join, one corpus-side partial agg,
    broadcast join-back."""
    df = QUERIES["q170_pareto_skyline"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_partial_aggregate(df)
    assert has_broadcast_join(df)


def test_q171_payload_never_shuffles(spark, sf_dir):
    """Synthesis and decode must share the scan stage: both MapInPandas
    below the first Exchange, so the binary column never crosses a
    shuffle — only feature scalars do."""
    df = QUERIES["q171_multimodal_audio"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("MapInPandas") == 2, plan
    # no Exchange BETWEEN the two kernels (plan text is top-down, so
    # "between" = between the decode occurrence and the synth
    # occurrence) — a repartition of the payload would appear there
    between = plan[plan.index("MapInPandas") : plan.rindex("MapInPandas")]
    assert "Exchange" not in between, plan


def test_q172_payload_never_shuffles(spark, sf_dir):
    """All THREE image kernels (synth, resize, decode) must chain in
    the scan stage: no Exchange between the first and last MapInPandas,
    so payload bytes are born, rewritten, and consumed without ever
    crossing a shuffle — only feature scalars reach the rollup."""
    df = QUERIES["q172_multimodal_image"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("MapInPandas") == 3, plan
    between = plan[plan.index("MapInPandas") : plan.rindex("MapInPandas")]
    assert "Exchange" not in between, plan


def test_q173_payload_never_shuffles(spark, sf_dir):
    """Video synth and frame sampling must chain in the scan stage (no
    Exchange between the two MapInPandas): the stream bytes are born
    and consumed on the same executor; the flatMap frame expansion is
    in-kernel, and only per-frame scalars reach the rollup."""
    df = QUERIES["q173_multimodal_video"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("MapInPandas") == 2, plan
    between = plan[plan.index("MapInPandas") : plan.rindex("MapInPandas")]
    assert "Exchange" not in between, plan


def test_q272_collated_groupby_is_one_exchange_sort_agg(spark, sf_dir):
    """Collated group keys are not hash-aggregable in Spark 4.1: the
    census must plan as a partial/final SortAggregate pair sharing
    EXACTLY ONE exchange on the collated key (the documented honest
    cost of collations — q272's plan note).  If a future Spark makes
    collated keys hash-aggregable this assertion flips to
    HashAggregate and the docstring note should be retired."""
    df = QUERIES["q272_collation_census"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "SortAggregate" in plan, plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan


def test_q271_payload_never_shuffles(spark, sf_dir):
    """All THREE video-tier kernels (synth, frame extraction, census)
    must chain in the scan stage: no Exchange between the first and
    last MapInPandas, so the stream bytes and the sliced frame
    payloads live and die on the same executor — only the |dur_class|
    integer census rows reach the aggregate's shuffle."""
    df = QUERIES["q271_video_frame_extract_census"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("MapInPandas") == 3, plan
    between = plan[plan.index("MapInPandas") : plan.rindex("MapInPandas")]
    assert "Exchange" not in between, plan


def test_plan_lint_rules_on_synthetic_plans():
    """Pin tools/plan_lint.py's rule detection on hand-built plan
    strings, independent of any real query: each antipattern string
    must be caught, allowlisted rules must be suppressed, and a clean
    plan must produce no findings."""
    import importlib
    import sys

    sys.path.insert(0, "tools") if "tools" not in sys.path else None
    plan_lint = importlib.import_module("tools.plan_lint")

    clean = "HashAggregate\n+- Exchange hashpartitioning(k, 4)\n+- Scan parquet"
    assert plan_lint.lint("qX", clean) == []
    cartesian = "Project\n+- CartesianProduct\n+- Scan parquet"
    assert [r for r, _ in plan_lint.lint("qX", cartesian)] == ["CARTESIAN"]
    bnlj = "Project\n+- BroadcastNestedLoopJoin BuildRight\n+- Scan"
    assert [r for r, _ in plan_lint.lint("qX", bnlj)] == ["BNLJ"]
    # allowlisted name suppresses exactly that rule
    assert plan_lint.lint("q47_scalar_subquery", bnlj) == []
    rowudf = "Project\n+- BatchEvalPython [f(x)]\n+- Scan"
    assert [r for r, _ in plan_lint.lint("qX", rowudf)] == ["ROW-UDF"]
    arrowudf = "Project\n+- ArrowEvalPython [f(x)]\n+- Scan"
    assert plan_lint.lint("qX", arrowudf) == []
    gwindow = "Window [rank()]\n+- Sort\n+- Exchange SinglePartition\n+- Scan"
    assert [r for r, _ in plan_lint.lint("qX", gwindow)] == ["GLOBAL-WINDOW"]
    assert plan_lint.lint("q49_ntile", gwindow) == []
    # findings only count in the FINAL AQE plan, not the initial one
    initial_only = clean + "\n== Initial Plan ==\nCartesianProduct"
    assert plan_lint.lint("qX", initial_only) == []
    # every allowlist entry names a registered query and a known rule
    from multi_threaded_mapreduce_framework_spark.queries import all_queries

    reg = set(all_queries())
    rules = {"CARTESIAN", "BNLJ", "ROW-UDF", "GLOBAL-WINDOW", "GLOBAL-SORT-NO-LIMIT"}
    for name, entry in plan_lint.ALLOW.items():
        assert name in reg, f"allowlist entry for unregistered query {name}"
        assert set(entry) <= rules, (name, entry)
