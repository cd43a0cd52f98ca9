"""Exact distributed-structure and audit-statistics queries
(q154-q161, q166-q170): histogram-offset global ordinal (q154),
deletion-neighborhood similarity join (q155), scan-stage partial top-k
pushdown (q156), first-occurrence novelty (q157), deterministic
watermark replay (q158), histogram weighted medians (q159), bitmask
language-overlap census (q160), sorted-neighborhood blocking (q161),
native batch session windows (q166), exact-parity linear interpolation
(q167), Benford first-digit census (q168), CUSUM changepoint scan
(q169), and the histogram-decomposed Pareto skyline (q170).

Each declares, as an oracle-checked query, an EXACT structure that
replaces an approximate sketch or a non-scalable plan at 100 TB:
bucket offsets instead of a single-partition global window (q154),
candidate generation + verify instead of an all-pairs string join
(q155), scan-stage partial top-k instead of a full-data ranking
shuffle (q156), a key-domain shuffle instead of corpus self-joins
(q157), a two-level distributed prefix scan instead of a total-order
window (q158), a value-domain histogram instead of sorting raw rows
(q159), a 2^|langs| mask census instead of a token-level pair join
(q160), and a block-keyed lag instead of a global sort (q161).  The
reference engine (``MapReduceFramework.cpp:160-218``) would express
every one as map/sort/shuffle/reduce with NO combiner.

(Split from t2_struct.py in round 6 — r5 verdict item 6; registration
content unchanged.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.queries.relational4 import (
    FIRST_WEEK_CUTOFF,
)
from multi_threaded_mapreduce_framework_spark.sources import load_table, spread_small_scan


@register(
    "q154_global_ordinal",
    tier="T2",
    oracle="""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS ordinal
FROM documents
""",
)
def q154_global_ordinal(spark, sf_dir):
    """Exact 1-based GLOBAL ordinal of every document under the total
    order (n_chars, doc_id) — the row id a curriculum sampler or
    sharded writer assigns — with NO corpus-sized window partition.

    Scale shape: ``row_number() OVER (ORDER BY ...)`` with no PARTITION
    BY collapses the corpus into ONE window partition (the q49/q111
    anti-pattern made global).  Here the ordinal decomposes into
    (offset of my n_chars bucket) + (my rank within the bucket): the
    bucket offsets come from the domain-bounded (n_chars) histogram —
    one partial-agg shuffle + a histogram-sized cumulative window —
    broadcast back, and the within-bucket rank is a window partitioned
    by n_chars, whose partitions are value-buckets, not the corpus.
    Same decomposition as q152's percentile (histogram -> offsets) but
    producing the exact per-row ordinal, tie-broken by doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        "n_chars", F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("off")
    )
    w_local = Window.partitionBy("n_chars").orderBy("doc_id")
    return (
        docs.join(F.broadcast(offsets), "n_chars")
        .select(
            "doc_id",
            (F.col("off") + F.row_number().over(w_local)).cast("bigint").alias("ordinal"),
        )
    )


@register(
    "q155_deletion_neighbors",
    tier="T2",
    oracle="""
WITH v AS (SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT a.c_name AS name1, b.c_name AS name2
FROM v a JOIN v b ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) = 1
""",
)
def q155_deletion_neighbors(spark, sf_dir):
    """Edit-distance-1 record pairs (near-identical customer names in
    one segment — the entity-resolution blocking step) via the FastSS
    deletion-neighborhood join, verified exactly.

    Scale shape: the oracle's formulation is an all-pairs string join —
    O(n^2) levenshtein calls, the first thing that dies on a real
    entity table.  Two strings are within edit distance 1 iff they
    share a member of {self} U {all single-character deletions}, so
    each name expands IN-ROW to length+1 variant keys, candidates meet
    on a variant equi-join (shuffle bounded by n x avg_len, never n^2),
    and one exact ``levenshtein() = 1`` check removes the distance-2
    collisions the neighborhood admits.  Candidate-generate + verify —
    the same filter/verify contract as q35's LSH and q126's prefix
    filter, here for edit distance."""
    names = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_name").alias("name"))
    )
    # empty names need no special case: sequence(1,0) is [1,0] and both
    # deletion variants of '' collapse to '' under array_union — the
    # exact FastSS neighborhood of the empty string
    variants = names.select(
        "name",
        F.explode(
            F.expr(
                "array_union(array(name), transform(sequence(1, length(name)),"
                " i -> concat(substring(name, 1, i - 1),"
                " substring(name, i + 1, length(name)))))"
            )
        ).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    return (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name1"), F.col("b.name").alias("name2"))
        .distinct()
        .filter(F.levenshtein("name1", "name2") == 1)
    )


@register(
    "q156_topk_pushdown",
    tier="T2",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice, CAST(rk AS INT) AS rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
""",
)
def q156_topk_pushdown(spark, sf_dir):
    """Exact top-3 orders by price per priority class, with the top-k
    PUSHED INTO THE SCAN STAGE (partial top-k per partition) so the
    ranking shuffle carries candidates, not the table.

    Scale shape: the textbook window (`row_number() <= k`) shuffles
    EVERY row to its group's reducer and sorts it, to then discard all
    but k — at 100 TB that's the whole fact table through the wire for
    a k x groups result.  The group-global top-k is contained in the
    union of per-partition per-group top-k's, so a bounded-memory
    ``mapInPandas`` pass (state: groups x k rows, folded batch by
    batch) runs inside the scan stage with NO prior shuffle, and only
    <= partitions x groups x k survivors enter the exact final window.
    Same sketch-then-exact contract as q135's heavy hitters, for
    ranking."""
    K = 3
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )

    def partial_topk(batches):
        import pandas as pd

        cand = None
        for pdf in batches:
            cur = pd.concat([cand, pdf]) if cand is not None else pdf
            cur = cur.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
            )
            cand = cur.groupby("o_orderpriority", sort=False).head(K)
        if cand is not None:
            yield cand

    survivors = orders.mapInPandas(partial_topk, orders.schema)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@register(
    "q157_novelty_score",
    tier="T2",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                               i -> array_to_string(ws[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       round(CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS novelty
FROM sh JOIN firsts f ON sh.shingle = f.shingle
GROUP BY sh.doc_id
""",
)
def q157_novelty_score(spark, sf_dir):
    """Per-document novelty: the fraction of a doc's distinct word
    trigrams whose corpus-wide FIRST occurrence (min doc_id) is the doc
    itself — the "how much new text does this contribute" signal corpus
    curators rank ingest batches by.

    Scale shape: novelty is a property of the doc x shingle bipartite
    relation, so everything routes through the shingle KEY domain: one
    partial-agg shuffle computes min(doc_id) per shingle, one shuffle
    joins ownership back, one partial-agg shuffle re-aggregates per
    doc.  No doc-to-doc comparison ever happens — the quadratic
    formulations (compare each doc against all earlier docs, q27-style)
    are replaced by the key-domain min, which is exactly the reference's
    reduce-per-key shape (``MapReduceFramework.cpp:224-239``) with a
    combiner."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    tri = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 2, 0)),"
        " (w, i) -> concat_ws(' ', slice(ws, i + 1, 3)))"
    )
    sh = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(tri).alias("shingle"))
        .distinct()
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


@register(
    "q158_watermark_replay",
    tier="T2",
    oracle="""
WITH e AS (
  SELECT event_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
         ((event_id % 900) * 61) % 900 AS delay_s
  FROM events
),
w AS (
  SELECT event_type, ts_s,
         max(ts_s) OVER (ORDER BY ts_s + delay_s, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - 600 AS wm
  FROM e
)
SELECT event_type,
       CAST(sum(CASE WHEN wm IS NULL OR ts_s >= wm THEN 1 ELSE 0 END) AS BIGINT)
         AS on_time_cnt,
       CAST(sum(CASE WHEN ts_s < wm THEN 1 ELSE 0 END) AS BIGINT) AS late_cnt
FROM w
GROUP BY event_type
""",
)
def q158_watermark_replay(spark, sf_dir):
    """Deterministic replay of Structured Streaming's watermark
    semantics as an oracle-checked batch query: events arrive delayed
    by a deterministic per-event network delay (0-900 s arithmetic
    hash), the watermark trails the max event-time SEEN so far by 600 s,
    and each event is late iff its event time is below the watermark at
    its arrival.  Census of on-time vs late per event type — the
    drop-rate report you run before choosing a production watermark.

    Scale shape: "max over all earlier arrivals" is a prefix scan in
    arrival order — as a single window it is one corpus-sized
    partition.  Here it is the two-level distributed prefix scan
    (Blelloch): arrival-HOUR buckets compute their in-bucket strict
    prefix max with a window partitioned by bucket, the per-bucket maxes
    (one row per hour — bounded by the time range, not the data) take a
    tiny cumulative window, and ``greatest(in_bucket, prev_buckets)``
    recombines.  Same decomposition as q139's prefix SUM, here for the
    non-invertible max, which no subtraction trick can emulate.
    Integer-second arithmetic end to end, so both engines compare
    identical values (FIXTURES.md timestamp convention)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("unix_seconds(date_trunc('second', ts))").alias("ts_s"),
        # 61 = 2654435761 % 900 (Knuth's multiplicative constant reduced
        # mod the delay range): ((a % 900) * 61) % 900 == (a *
        # 2654435761) % 900 for every a, with a max intermediate of
        # 899 * 61 — the unreduced product overflows BIGINT at
        # event_id >= ~3.5e9, where ANSI DuckDB raises while Spark
        # wraps silently, so the gate itself would diverge off-fixture.
        F.expr("((event_id % 900) * 61) % 900").alias("delay_s"),
    )
    ev = ev.withColumn("arr", F.col("ts_s") + F.col("delay_s")).withColumn(
        "bkt", F.expr("arr div 3600")
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ev.withColumn("pre_in", F.max("ts_s").over(w_in))
    bmax = ev.groupBy("bkt").agg(F.max("ts_s").alias("bm"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prev = bmax.select("bkt", F.max("bm").over(w_b).alias("pre_b"))
    return (
        local.join(F.broadcast(prev), "bkt")
        .withColumn("wm", F.greatest("pre_in", "pre_b") - 600)
        .withColumn(
            "late",
            F.when(F.col("wm").isNull(), F.lit(False)).otherwise(
                F.col("ts_s") < F.col("wm")
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum((~F.col("late")).cast("int")).cast("bigint").alias("on_time_cnt"),
            F.sum(F.col("late").cast("int")).cast("bigint").alias("late_cnt"),
        )
    )


@register(
    "q159_weighted_median",
    tier="T2",
    oracle="""
WITH hist AS (
  SELECT l_returnflag, l_quantity,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, l_quantity,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM hist
)
SELECT l_returnflag, CAST(min(l_quantity) AS INT) AS wmed_qty
FROM cum WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
)
def q159_weighted_median(spark, sf_dir):
    """Revenue-weighted median order quantity per return flag ("half
    the money sits at or below this quantity") — computed from the
    VALUE-DOMAIN histogram, never by sorting raw rows.

    Scale shape: a weighted median normally wants the rows of each
    group sorted by value with a running weight — a corpus-sized window
    again.  l_quantity has a bounded domain (50 distinct values), so
    the exact answer folds into one partial-agg shuffle to the
    (flag, quantity) histogram, a histogram-sized cumulative window,
    and a one-row-per-group min.  Weights are summed as DECIMAL(18,2)
    (prices carry 2 dp), so the partial sums are EXACT and associative
    — the `2*cum >= total` boundary cannot flip on float summation
    order between engines (FIXTURES.md micro-unit convention)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    hist = li.groupBy("l_returnflag", "l_quantity").agg(F.sum("price").alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").cast("int").alias("wmed_qty"))
    )


@register(
    "q160_lang_overlap",
    tier="T2",
    oracle="""
WITH tl AS (
  SELECT DISTINCT lang, tok
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0
),
s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM tl GROUP BY lang),
i AS (
  SELECT a.lang AS l1, b.lang AS l2, CAST(count(*) AS BIGINT) AS inter
  FROM tl a JOIN tl b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT i.l1, i.l2, sa.n AS n1, sb.n AS n2, i.inter,
       round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
FROM i JOIN s sa ON sa.lang = i.l1 JOIN s sb ON sb.lang = i.l2
""",
)
def q160_lang_overlap(spark, sf_dir):
    """Pairwise vocabulary overlap between languages (exact Jaccard on
    distinct-token sets) — the cross-corpus contamination / shared-
    vocabulary matrix — via a 2^|langs| BITMASK CENSUS instead of a
    token-level pair join.

    Scale shape: the oracle joins the token-language relation with
    itself on tok — a second full shuffle of the vocabulary whose
    output grows with pairs x shared tokens.  Membership of a token is
    one bit per language, so: assign each language a bit (rank over the
    tiny distinct-lang table, broadcast), OR the bits per token (one
    partial-agg shuffle over the vocab — the only data-sized move),
    then count tokens per MASK: at most 2^|langs| rows.  Every pairwise
    intersection/union is a conditional sum over that census — lang
    pairs x masks, all broadcast-tiny.  Adding a 6th language grows the
    census to 64 rows, not the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tl = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .distinct()
    )
    langs = docs.select("lang").distinct()
    w_idx = Window.orderBy("lang")  # tiny: one row per language
    # The bit layout holds at most 64 languages; Spark (Java) shift
    # semantics MASK the shift amount to 6 bits, so a 65th language
    # would silently alias to bit 0 and corrupt every Jaccard count.
    # Guard in-plan: a 65th distinct lang fails the job loudly instead.
    lang_bits = langs.select(
        "lang", (F.row_number().over(w_idx) - 1).alias("idx")
    ).select(
        "lang",
        F.expr(
            "CASE WHEN idx < 64"
            " THEN shiftleft(CAST(1 AS BIGINT), CAST(idx AS INT))"
            " ELSE raise_error("
            "'q160: more than 64 distinct languages — 64-bit lang"
            " bitmask layout would alias; widen to a mask array')"
            " END"
        ).alias("bit"),
    )
    masks = (
        tl.join(F.broadcast(lang_bits), "lang")
        .groupBy("tok")
        .agg(F.expr("bit_or(bit)").alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        lang_bits.alias("x")
        .join(
            lang_bits.alias("y"),
            F.col("x.lang") < F.col("y.lang"),
        )
        .select(
            F.col("x.lang").alias("l1"),
            F.col("y.lang").alias("l2"),
            F.col("x.bit").alias("b1"),
            F.col("y.bit").alias("b2"),
        )
    )
    cells = pairs.join(
        F.broadcast(masks),
        (F.expr("mask & b1") != 0) | (F.expr("mask & b2") != 0),
    )
    agg = cells.groupBy("l1", "l2").agg(
        F.sum(
            F.when((F.expr("mask & b1") != 0) & (F.expr("mask & b2") != 0), F.col("cnt"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("inter"),
        F.sum(F.when(F.expr("mask & b1") != 0, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.expr("mask & b2") != 0, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n2"),
    )
    return (
        agg.filter(F.col("inter") > 0)
        .select(
            "l1",
            "l2",
            "n1",
            "n2",
            "inter",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter")),
                4,
            ).alias("jac"),
        )
    )


@register(
    "q161_sorted_neighborhood",
    tier="T2",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         string_split(text, ' ')[1] AS w1,
         array_to_string(string_split(text, ' ')[1:2], ' ') AS p2
  FROM documents
),
lagd AS (
  SELECT doc_id, p2,
         lag(doc_id) OVER (PARTITION BY w1 ORDER BY text, doc_id) AS prev_id,
         lag(p2) OVER (PARTITION BY w1 ORDER BY text, doc_id) AS prev_p2
  FROM d
)
SELECT prev_id AS doc_a, doc_id AS doc_b, p2 AS shared_prefix
FROM lagd WHERE prev_id IS NOT NULL AND p2 = prev_p2
""",
)
def q161_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup blocking: candidate near-duplicate
    pairs = documents ADJACENT in sort order that share their two-word
    opening (boilerplate-opening detection) — the third classical
    blocking family next to LSH (q35) and prefix filtering (q126).

    Scale shape: the method needs a sorted neighborhood, not a global
    sort.  The sort key's own leading token is the block: two docs can
    only share a 2-word prefix if they share the 1st word, so windowing
    PARTITION BY first-word ORDER BY (text, doc_id) is LOSSLESS for the
    adjacency predicate while keeping every window partition a
    vocabulary bucket instead of the corpus.  One shuffle, one lag —
    no self-join, no single-partition window.  A skewed opening word
    (every doc starting "the") widens one bucket; the fix is one more
    prefix word in the block key, the same governable trade as q142's
    basket cap."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.element_at(F.split("text", " "), 1).alias("w1"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("p2"),
    )
    w = Window.partitionBy("w1").orderBy("text", "doc_id")
    lagd = docs.select(
        "doc_id",
        "p2",
        F.lag("doc_id").over(w).alias("prev_id"),
        F.lag("p2").over(w).alias("prev_p2"),
    )
    return (
        lagd.filter(F.col("prev_id").isNotNull() & (F.col("p2") == F.col("prev_p2")))
        .select(
            F.col("prev_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("p2").alias("shared_prefix"),
        )
    )



@register(
    "q166_session_window",
    tier="T2",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
),
s AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS st
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sid AS (
  SELECT user_id,
         sum(st) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
),
per AS (SELECT user_id, sid, count(*) AS n FROM sid GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS num_sessions,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per GROUP BY user_id
""",
)
def q166_session_window(spark, sf_dir):
    """Per-user session census — session count and busiest session —
    via Spark's NATIVE gap-based ``session_window`` in BATCH mode (the
    same operator the streaming tier runs under a watermark,
    ``streaming/windowed.py``).

    q23 builds sessions from lag + running-sum windows (two window
    passes sharing one user_id shuffle); this is the built-in form —
    one shuffle on user_id into the session-merging aggregate (sorted
    merge per key, state bounded by one session), then a per-user
    rollup of session rows.  Boundary semantics pinned by the oracle:
    a gap of EXACTLY the 30-minute threshold still MERGES — Spark's
    session window end is last + gap and a new event merges while
    ``ts <= end`` — so the session-start condition is the strict
    ``gap > threshold``, the same comparison q23 uses; the oracle
    encodes it in integer microseconds so both engines agree exactly
    (verified against an exact-30:00 two-event probe)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("num_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
    )


@register(
    "q167_linear_interpolate",
    tier="T2",
    oracle=f"""
WITH ev AS (SELECT user_id, ts FROM events
            WHERE ts < TIMESTAMP '{FIRST_WEEK_CUTOFF}'),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT user_id, unnest(generate_series(date_trunc('hour', min(ts)),
                                         date_trunc('hour', max(ts)),
                                         INTERVAL 1 HOUR)) AS h
  FROM ev GROUP BY user_id
),
j AS (
  SELECT g.user_id, g.h, obs.n,
         CAST(epoch(g.h) AS BIGINT) // 3600 AS hn
  FROM grid g LEFT JOIN obs ON obs.user_id = g.user_id AND obs.h = g.h
),
f AS (
  SELECT user_id, h, n, hn,
         last_value(n IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN n IS NOT NULL THEN hn END IGNORE NULLS) OVER wp AS ph,
         first_value(n IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN n IS NOT NULL THEN hn END IGNORE NULLS) OVER wn AS nh
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY hn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY hn
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_hour,
       CAST(CASE WHEN n IS NOT NULL THEN n * 1000000
                 ELSE ((pv * (nh - ph) + (nv - pv) * (hn - ph)) * 1000000)
                      // (nh - ph)
            END AS BIGINT) AS n_interp_micro
FROM f
""",
)
def q167_linear_interpolate(spark, sf_dir):
    """Linear interpolation of each user's hourly activity curve over
    silent hours (q82 zero-fills the same grid; models and anomaly
    baselines want the interpolated line, not zeros).

    Scale shape: identical to q82 — per-user grid from two aggregate
    scalars, everything riding the user_id partitioning; the fills are
    two ignore-nulls windows (running last / upcoming first) on that
    same shuffle.  The grid's endpoints are always OBSERVED hours (it
    spans min..max event), so every silent hour sits strictly between
    two observations and the interpolation needs no edge case.
    Engine parity by the FIXTURES.md micro-unit convention: every
    interpolation input is exact int64 (counts, hour numbers), so the
    line evaluates as the exact rational ``(pv*DT + (nv-pv)*dt) / DT``
    and the output is its floor in integer micro-units — no doubles
    anywhere, hence no exposure to the engines' divergent round()
    behavior on shortest-decimal half boundaries."""
    from multi_threaded_mapreduce_framework_spark.queries.relational4 import (
        first_week_events,
        user_hour_grid,
    )

    ev = first_week_events(spark, sf_dir)
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = user_hour_grid(ev).withColumnRenamed("bucket_ts", "h")
    j = grid.join(obs, ["user_id", "h"], "left").select(
        "user_id", "h", "n", F.expr("unix_seconds(h) div 3600").alias("hn")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "first upcoming observation" as a RUNNING frame over the DESC
    # order, not a [current, unbounded following] frame: Spark's
    # UnboundedFollowing window frame re-evaluates the aggregate from
    # scratch for every row (O(rows^2) per partition — measured 1.76 s
    # for this query's 168-row-max user grids under the honest noop
    # action, r6 bench tail), while the UnboundedPreceding frame is a
    # single running accumulation.  Both windows still ride ONE
    # user_id exchange; the DESC window adds a partition-local re-sort,
    # which the ASC wn frame also required.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hn"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hn_obs = F.when(F.col("n").isNotNull(), F.col("hn"))
    filled = j.select(
        "user_id",
        "h",
        "n",
        "hn",
        F.last("n", ignorenulls=True).over(wp).alias("pv"),
        F.last(hn_obs, ignorenulls=True).over(wp).alias("ph"),
        F.last("n", ignorenulls=True).over(wn).alias("nv"),
        F.last(hn_obs, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = F.when(
        F.col("n").isNotNull(), F.col("n") * F.lit(1_000_000)
    ).otherwise(
        F.expr(
            "((pv * (nh - ph) + (nv - pv) * (hn - ph)) * 1000000)"
            " div (nh - ph)"
        )
    )
    return filled.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
        interp.cast("bigint").alias("n_interp_micro"),
    )


@register(
    "q168_benford_audit",
    tier="T2",
    oracle="""
WITH d AS (
  SELECT o_orderpriority,
         CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (
  SELECT o_orderpriority, digit, CAST(count(*) AS BIGINT) AS cnt
  FROM d GROUP BY 1, 2
),
t AS (SELECT o_orderpriority, sum(cnt) AS n FROM c GROUP BY 1)
SELECT c.o_orderpriority, c.digit, c.cnt,
       CAST((c.cnt * 10000) // t.n AS BIGINT) AS p_obs_bp,
       round(log10(1.0 + 1.0 / c.digit), 4) AS p_benford
FROM c JOIN t ON c.o_orderpriority = t.o_orderpriority
""",
)
def q168_benford_audit(spark, sf_dir):
    """First-significant-digit census of order totals per priority
    class vs Benford's law — the fraud/synthetic-data audit that flags
    a partition whose digit distribution cannot come from natural
    multiplicative data.

    Scale shape: the digit is an in-row expression under the scan, the
    census is one domain-bounded partial-agg shuffle (priorities x 9
    digits), and the per-class totals join back from the census itself
    — no second scan, nothing data-sized after the first aggregate.
    The observed share is exact integer basis points
    ((cnt*10000) div n — the micro-unit convention); the Benford
    reference is a fixed set of nine constants whose 4-dp roundings
    are verified off the half-boundary, so both engines agree."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        "o_orderpriority",
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    )
    c = d.groupBy("o_orderpriority", "digit").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.groupBy("o_orderpriority").agg(F.sum("cnt").alias("n"))
    return (
        c.join(F.broadcast(t), "o_orderpriority")
        .select(
            "o_orderpriority",
            "digit",
            "cnt",
            F.expr("(cnt * 10000) div n").cast("bigint").alias("p_obs_bp"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 4).alias(
                "p_benford"
            ),
        )
    )


@register(
    "q169_cusum_changepoint",
    tier="T2",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
m AS (SELECT CAST(sum(x) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nd FROM daily),
c AS (
  SELECT d, x,
         sum(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cx,
         row_number() OVER (ORDER BY d) AS i
  FROM daily
)
SELECT CAST(c.d AS VARCHAR) AS day, c.x AS n_events,
       round(CAST(c.cx * m.nd - c.i * m.tot AS DOUBLE) / m.nd, 4) AS cusum
FROM c, m
ORDER BY abs(CAST(c.cx * m.nd - c.i * m.tot AS DOUBLE) / m.nd) DESC, c.d
LIMIT 5
""",
)
def q169_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint scan over the daily event-count series: the 5
    days where the cumulative deviation from the global mean peaks —
    the first statistic a rate-shift / regression detector computes.

    Scale shape: the only corpus pass is the daily-count partial
    aggregate; the CUSUM runs entirely on the DAY domain (bounded by
    the time range).  The deviation sum is kept EXACT by clearing the
    mean's denominator: cusum_i = (cx_i * n_days - i * total) / n_days
    where cx, i, total, n_days are all exact int64 — one float
    division at the end, identical in both engines.  The day-domain
    window is single-partition by construction (it is the histogram,
    not the data — q154's discipline)."""
    ev = load_table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("x"))
    m = daily.agg(
        F.sum("x").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.select(
        "d",
        "x",
        F.sum("x").over(w).alias("cx"),
        F.row_number().over(Window.orderBy("d")).alias("i"),
    )
    cusum = (
        (F.col("cx") * F.col("nd") - F.col("i") * F.col("tot")).cast("double")
        / F.col("nd")
    )
    return (
        c.join(F.broadcast(m))
        .select(
            F.col("d").cast("string").alias("day"),
            F.col("x").alias("n_events"),
            cusum.alias("_raw"),
        )
        # top-k discipline (q28/FIXTURES.md): order on the RAW value,
        # round only in the output projection
        .orderBy(F.abs(F.col("_raw")).desc(), F.col("day"))
        .limit(5)
        .select("day", "n_events", F.round("_raw", 4).alias("cusum"))
    )


@register(
    "q170_pareto_skyline",
    tier="T2",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS v,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
)
SELECT a.doc_id, a.v, a.n
FROM d a
WHERE NOT EXISTS (
  SELECT 1 FROM d b
  WHERE b.v >= a.v AND b.n <= a.n AND (b.v > a.v OR b.n < a.n)
)
""",
)
def q170_pareto_skyline(spark, sf_dir):
    """Pareto skyline of documents under (MAXIMIZE vocabulary size,
    MINIMIZE token count) — the multi-objective "best trade-off"
    operator (here: the densest texts per vocabulary level, a
    curriculum/dedup-exemplar selection shape).

    Scale shape: the oracle's NOT EXISTS is an all-pairs dominance
    test — O(n^2) and the textbook skyline bottleneck.  For a 2D
    skyline with one DOMAIN-BOUNDED dimension the answer decomposes
    exactly (q154/q158's histogram discipline, here with a SUFFIX
    aggregate): per vocabulary value v, best_n(v) = min token count
    (partial-agg shuffle over the v domain); suffix_min(v) = min of
    best_n over all larger v (a window over the tiny histogram); a doc
    survives iff its n == best_n(v) AND n < suffix_min(v).  Equal
    (v, n) duplicates all survive — dominance requires a strict
    inequality — which the decomposition preserves.  One corpus
    shuffle, one broadcast join-back, zero pairwise work."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    d = docs.select(
        "doc_id",
        F.size(F.array_distinct("ws")).cast("bigint").alias("v"),
        F.size("ws").cast("bigint").alias("n"),
    )
    hist = d.groupBy("v").agg(F.min("n").alias("best_n"))
    w_suffix = (
        Window.orderBy(F.desc("v")).rowsBetween(Window.unboundedPreceding, -1)
    )
    cuts = hist.select(
        "v", "best_n", F.min("best_n").over(w_suffix).alias("suffix_min")
    )
    return (
        d.join(F.broadcast(cuts), "v")
        .filter(
            (F.col("n") == F.col("best_n"))
            & (F.col("suffix_min").isNull() | (F.col("n") < F.col("suffix_min")))
        )
        .select("doc_id", "v", "n")
    )
