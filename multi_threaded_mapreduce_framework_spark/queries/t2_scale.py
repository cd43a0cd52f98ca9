"""Scale-pattern queries (q135-q141): bounded-memory heavy hitters,
an explicit Bloom runtime join filter, Z-order multi-dimensional data
skipping, BPE merge statistics, distributed-prefix-sum PPS sampling,
in-row character entropy, and robust (median/MAD) outlier detection.

Each one declares, as an oracle-checked query, a technique a 100 TB
pipeline reaches for when the naive relational plan stops scaling:
sketch-then-exact-recount instead of shuffling the full key domain
(q135), probe-side pre-filtering instead of shuffling rows that cannot
join (q136), physical clustering instead of full scans under
multi-column predicates (q137), vocab-sized instead of corpus-sized
training statistics (q138), a two-phase prefix sum instead of a
single-partition global window (q139), zero-shuffle in-row profiling
(q140), and broadcast-scalar robust statistics (q141).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
)
from multi_threaded_mapreduce_framework_spark.functions.heavy_hitters import (
    bigram_mg_candidates,
)
from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import (
    layout_tag,
    load_table,
    spread_small_scan,
)

# q135: support threshold 1/5000 of all shingle occurrences; the MG
# sketch keeps MG_K counters per partition, guaranteeing recall for
# every item with global count > N/(MG_K+1) — and N/(MG_K+1) < the
# enforced threshold floor(N/5000)+1, so the candidate union is a
# provable superset of the reported set.
MG_K = 5000


@register(
    "q135_heavy_hitter_shingles",
    tier="T2",
    oracle="""
WITH sh AS (
  SELECT unnest(list_transform(range(1, greatest(len(ws), 1)),
                i -> array_to_string(ws[i:i+1], ' '))) AS shingle
  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh)
SELECT shingle, CAST(count(*) AS BIGINT) AS cnt
FROM sh
GROUP BY shingle
HAVING count(*) >= (SELECT CAST(floor(n / 5000.0) AS BIGINT) + 1 FROM tot)
""",
)
def q135_heavy_hitter_shingles(spark, sf_dir):
    """Heavy-hitter token bigrams (support > 0.02% of all bigram
    occurrences) via per-partition Misra-Gries + exact recount
    (``functions/heavy_hitters.py``).

    Scale shape: a plain groupBy over shingles shuffles the WHOLE
    shingle domain — corpus-sized, Zipf-tailed, exactly what dies
    first at 100 TB.  Here the MG sketch runs INSIDE the scan stage
    (mapInPandas, no shuffle before it) and emits at most
    MG_K x numPartitions candidate keys; only shingles that
    broadcast-semi-join the candidate set enter the counting shuffle.
    MG guarantees no false negatives above N/(MG_K+1) < threshold, and
    the exact recount removes every false positive — the result is
    exact, byte-identical to the oracle's full GROUP BY."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    sh2 = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " (w, i) -> concat_ws(' ', slice(ws, i + 1, 2)))"
    )
    shingles = (
        docs.select(F.split("text", " ").alias("ws"))
        .select(F.explode(sh2).alias("shingle"))
    )
    # r12: the sketch pass builds bigrams INSIDE the Python kernel (only
    # `text` crosses the Arrow boundary — guide §4.1), and the total
    # occurrence count folds in-row sizes (sum of per-doc size(ws)-1 ==
    # the explode count by construction) instead of re-running the
    # bigram explode a third time.  Paired A/B at sf0.1: 1.59 -> 1.40 s
    # for the two together; the exact recount below is unchanged, so
    # the result is identical for ANY correct-recall candidate set.
    cand = bigram_mg_candidates(docs, "text", MG_K).distinct()
    tot = docs.select(F.split("text", " ").alias("ws")).agg(
        F.sum(F.greatest(F.size("ws") - 1, F.lit(0))).alias("n")
    )
    thr = (F.floor(F.col("n") / F.lit(5000.0)) + 1).cast("bigint")
    return (
        shingles.join(F.broadcast(cand), "shingle", "left_semi")
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(tot))
        .filter(F.col("cnt") >= thr)
        .select("shingle", "cnt")
    )


@register(
    "q136_bloom_prefilter_join",
    tier="T1",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def q136_bloom_prefilter_join(spark, sf_dir):
    """Urgent-order revenue by year, with the probe side pre-filtered
    by an EXPLICIT Bloom filter (``functions/bloom.py``) before the
    exact join.

    Scale shape: the build side (urgent orders) is ~20% of orders —
    too many keys to ship as an IN-list, and at 100 TB possibly too
    big to broadcast-hash-join outright.  The Bloom build is a
    domain-bounded bit_or aggregate (<= m/64 = 1024 rows regardless of
    build rows); the probe is a pure map-side k-hash bit test under
    the lineitem scan, so rows that cannot join never enter the
    shuffle.  False positives are removed by the exact shuffle join
    that follows (false negatives are impossible), so the result is
    identical to the plain join the oracle runs — the filter only
    shrinks the shuffle.  This is the declarable form of Spark's own
    runtime row-level filtering (injected only under optimizer
    heuristics; its ``bloom_filter_agg`` is not publicly registered)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    bloom = bloom_build(urgent.select("o_orderkey"), "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    pre = li.join(F.broadcast(bloom)).filter(
        bloom_might_contain("l_orderkey")
    ).drop("bloom")
    return (
        pre.join(urgent, pre.l_orderkey == urgent.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "q137_zorder_skipping",
    tier="T1",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 220 AND l_suppkey BETWEEN 10 AND 25
""",
)
def q137_zorder_skipping(spark, sf_dir):
    """Multi-dimensional data skipping via Z-ORDER clustering: lineitem
    is rewritten range-partitioned + sorted on the interleaved-bit
    z-value of (l_partkey, l_suppkey), then a two-column box predicate
    reads it back.

    Scale shape: sorting on ONE key gives tight parquet min/max stats
    for that key only; interleaving the two keys' low 16 bits makes
    every output file cover a small axis-aligned box in (partkey,
    suppkey) space, so the footer stats prune files/row-groups for
    predicates on EITHER OR BOTH dimensions — the standard lakehouse
    layout trick (Delta/Iceberg OPTIMIZE ZORDER) expressed with
    nothing but ``repartitionByRange`` + ``sortWithinPartitions``.
    ``tests/test_scale_queries.py`` asserts per-file min/max spans are
    a small fraction of the global span on BOTH dimensions.  Values
    are layout-independent, so the oracle runs on the raw parquet."""
    tag = layout_tag(spark, sf_dir)
    base = os.path.join(tempfile.gettempdir(), "mtmrf_layout", tag, "lineitem_zorder")
    # same one-time-OPTIMIZE reuse discipline as q115: a completed
    # layout under this session-unique tag is this session's own write
    # of the same fixture — skip the rewrite, read it back
    if os.path.exists(os.path.join(base, "_SUCCESS")):
        return _zorder_read(spark, base)
    # project the layout to the columns this table serves before the
    # rewrite — a real OPTIMIZE rewrites whole rows, but the write is
    # the dominant cost here and the skipping demonstration only needs
    # the clustered keys + measures
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Normalize both keys to the full 16-bit range first (broadcast
    # 1-row min/max): raw interleaving of unequal domains degenerates
    # to a single-key sort, because the wider key's bits occupy all
    # the high z positions — the same rank/scale step real OPTIMIZE
    # ZORDER implementations apply.
    rng = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    # Morton interleave by parallel bit-spread (x |= x<<8 &mask; <<4;
    # <<2; <<1), staged through withColumn so codegen evaluates each
    # step ONCE — ~3x cheaper per row than a 16-iteration aggregate()
    # lambda, and the z column is computed twice (range-partition
    # sampling + the real pass), doubling whatever it costs.
    staged = (
        li.join(F.broadcast(rng))
        .withColumn(
            "pn", F.expr("(l_partkey - pmin) * 65535 div greatest(pmax - pmin, 1)")
        )
        .withColumn(
            "sn", F.expr("(l_suppkey - smin) * 65535 div greatest(smax - smin, 1)")
        )
    )
    for shift, mask in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
        staged = staged.withColumn(
            "pn", F.expr(f"(pn | shiftleft(pn, {shift})) & {mask}")
        ).withColumn("sn", F.expr(f"(sn | shiftleft(sn, {shift})) & {mask}"))
    (
        staged.withColumn("z", F.expr("shiftleft(pn, 1) | sn"))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z", "pn", "sn", "pmin", "pmax", "smin", "smax")
        .write.mode("overwrite")
        .parquet(base)
    )
    return _zorder_read(spark, base)


def _zorder_read(spark, base):
    """The read side of q137: two-column box predicate over the
    z-ordered layout (file/row-group skipping via footer stats)."""
    part = spark.read.parquet(base)
    return (
        part.filter(
            F.col("l_partkey").between(100, 220) & F.col("l_suppkey").between(10, 25)
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count_distinct(F.col("l_orderkey")).alias("n_orders"),
        )
    )


@register(
    "q138_bpe_pair_counts",
    tier="T2",
    oracle="""
WITH wf AS (
  SELECT token AS word, CAST(count(*) AS BIGINT) AS wcnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(word)), i -> substr(word, i, 2))) AS pair,
         wcnt
  FROM wf WHERE len(word) >= 2
)
SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""",
)
def q138_bpe_pair_counts(spark, sf_dir):
    """Top-20 adjacent character-pair frequencies weighted by word
    frequency — the statistic ONE BPE merge step maximizes (the pair a
    tokenizer trainer would merge next).

    Scale shape: real BPE trainers never rescan the corpus per merge —
    they count words once, then iterate over the VOCABULARY with
    frequencies.  Same here: the only corpus-sized pass is the word
    count (partial-agg shuffle); pair expansion and counting run over
    the vocab table, whose size is bounded by the language, not the
    data.  Deterministic top-k: count desc, pair asc tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    pairs = wf.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "wcnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wcnt").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


@register(
    "q139_pps_systematic_sample",
    tier="T2",
    oracle="""
WITH c AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         CAST(sum(n_chars) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM documents
),
st AS (SELECT CAST(greatest(sum(n_chars) // 200, 1) AS BIGINT) AS step FROM documents)
SELECT doc_id, w, cum, CAST(cum // step AS BIGINT) AS pick_idx
FROM c, st
WHERE cum // step > (cum - w) // step
""",
)
def q139_pps_systematic_sample(spark, sf_dir):
    """Probability-proportional-to-size systematic sample (~200 docs,
    weight = n_chars): a doc is selected iff its weight interval
    [cum-w, cum) crosses a multiple of step = floor(W/200).  Pure
    integer arithmetic — deterministic, no RNG, engine-exact.

    Scale shape: the textbook formulation is a running sum over a
    GLOBAL order — a single-partition window, the one plan that cannot
    scale (q111's lesson).  Here the prefix sum is computed in two
    phases: per-shard subtotals (32 rows) get offsets via a window
    over the tiny shard table; each row's global cum is its shard
    offset + a within-shard running sum (window PARTITIONED by shard).
    Shards are contiguous doc_id ranges from a broadcast 1-row max —
    monotone in the global order, so the two-phase sum equals the
    oracle's one-window sum exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("w")
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))
    sharded = docs.join(F.broadcast(mx)).withColumn(
        "shard", F.expr("doc_id div cast(ceil((mx + 1) / 32.0) as bigint)")
    )
    shard_tot = sharded.groupBy("shard").agg(F.sum("w").alias("sw"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = shard_tot.select(
        "shard", F.coalesce(F.sum("sw").over(w_off), F.lit(0)).cast("bigint").alias("off")
    )
    step_df = shard_tot.agg(
        F.greatest(F.expr("sum(sw) div 200"), F.lit(1)).cast("bigint").alias("step")
    )
    w_loc = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sharded.join(F.broadcast(offs), "shard").select(
        "doc_id", "w", (F.col("off") + F.sum("w").over(w_loc)).cast("bigint").alias("cum")
    )
    return (
        cum.join(F.broadcast(step_df))
        .filter(F.expr("cum div step > (cum - w) div step"))
        .select("doc_id", "w", "cum", F.expr("cum div step").cast("bigint").alias("pick_idx"))
    )


@register(
    "q140_char_entropy",
    tier="T2",
    oracle="""
WITH cs AS (
  SELECT doc_id, list_transform(range(1, len(text) + 1), i -> substr(text, i, 1)) AS cs
  FROM documents WHERE len(text) > 0
)
SELECT doc_id,
       CAST(len(cs) AS BIGINT) AS n_chars,
       CAST(len(list_distinct(cs)) AS BIGINT) AS n_uniq,
       greatest(round(-list_sum(list_transform(list_distinct(cs),
           c -> (CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / len(cs))
                * log2(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / len(cs)))), 4),
           0.0) AS entropy
FROM cs
""",
)
def q140_char_entropy(spark, sf_dir):
    """Per-document character-distribution Shannon entropy (plus
    char/unique-char counts) — the classic cheap quality proxy:
    near-zero entropy flags repeated-character junk, unusually high
    entropy flags binary-in-text garbage.

    Scale shape: ZERO shuffles.  The histogram is computed IN-ROW
    (sort the char array, fold its run lengths), so the whole query is
    a map-side projection over the scan — no explode, no (doc_id,
    char) shuffle, nothing that grows with corpus size beyond the scan
    itself.  The run-length form is O(n log n) per row; the earlier
    per-distinct-char filter scan was O(n * k) with two array scans
    per distinct char — invisible under the old count()-pruned bench
    action and a measured 5.1 s -> 1.25 s at sf0.1 once the noop sink
    timed the real projection.  The entropy is clamped at 0 after
    rounding (the fold can return -0.0)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # run-start flags: each sorted char vs its predecessor (the shifted
    # copy is built with slice/concat — NEVER indexed inside a lambda,
    # which would re-evaluate the sort per element)
    starts = F.expr(
        "filter(transform("
        " zip_with(sc, concat(array(cast(NULL as string)),"
        "                     slice(sc, 1, greatest(size(sc) - 1, 0))),"
        "          (c, p) -> IF(p IS NULL OR c <> p, 1, 0)),"
        " (f, i) -> IF(f = 1, cast(i as double), cast(-1 as double))),"
        " v -> v >= cast(0 as double))"
    )
    ent = F.expr(
        "aggregate(zip_with(starts, concat(slice(starts, 2,"
        " greatest(size(starts) - 1, 0)), array(cast(size(cs) as double))),"
        " (a, b) -> (b - a) / size(cs) * log2((b - a) / size(cs))),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )
    # r11 note: sorting CODEPOINTS (ascii() per char) instead of 1-char
    # strings was tried — bit-identical run structure — and measured a
    # WASH-to-slightly-slower paired A/B (1.43 vs 1.56 s median at
    # sf0.1): the per-char ascii transform costs what the cheaper long
    # sort saves.  The string form stands (OPTIMIZATION_r11.md).
    return (
        docs.select("doc_id", F.split("text", "").alias("cs"))
        .withColumn("sc", F.array_sort("cs"))
        .withColumn("starts", starts)
        .select(
            "doc_id",
            F.size("cs").cast("bigint").alias("n_chars"),
            F.size("starts").cast("bigint").alias("n_uniq"),
            F.greatest(F.round(-ent, 4), F.lit(0.0)).alias("entropy"),
        )
    )


@register(
    "q141_mad_outliers",
    tier="T1",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       round(m.med, 4) AS med,
       round(d.mad, 4) AS mad,
       CAST(count(*) FILTER (WHERE abs(e.value - m.med) > 3 * d.mad) AS BIGINT)
         AS n_outliers
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
GROUP BY e.event_type, m.med, d.mad
""",
)
def q141_mad_outliers(spark, sf_dir):
    """Robust per-group outlier detection: exact median and median
    absolute deviation (MAD) per event_type, then the count of values
    beyond 3 MADs — the quality gate that, unlike mean/stddev, is not
    itself dragged by the outliers it hunts.

    Scale shape: two grouped EXACT ``percentile`` aggregates (Spark's
    sort-based exact percentile — per-group state, distributed by the
    group key) with the tiny per-group stats broadcast back between
    passes; the group count is bounded by the event-type domain, so
    every join here is a broadcast, never a fact-fact shuffle.  Both
    engines interpolate the median identically (linear between closest
    ranks), so the rounded stats and the strict-inequality counts are
    engine-exact."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("int")).cast("bigint").alias(
                "n_outliers"
            )
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )
