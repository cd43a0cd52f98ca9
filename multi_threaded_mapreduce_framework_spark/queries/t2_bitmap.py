"""Bitmap-word and HLL distinct-count layers (q153, q162-q165, q177).

Re-aggregatable distinct counting: exact 64-bit bitmap words (wi =
id div 64 -> bit_or(1 << (id mod 64))) whose OR-merge is associative
AND idempotent — the q153 word layer plus its composition suite (set
algebra q162, rollup q163, next-day retention q164, rolling WAU q165)
— and the portable HyperLogLog register layer (q177) for when even
ids/8 bytes of exact state is too much.  Every query here declares, as
an oracle-checked result, partial state a 100 TB pipeline would
PERSIST: daily words/registers merge into monthly ones without
re-reading raw data, which raw-key count-distinct re-scans can never
do.  The reference engine (``MapReduceFramework.cpp:160-218``) would
shuffle every raw (key, id) pair with no combiner; these layers exist
precisely to keep that shuffle sub-linear.

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
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q153_bitmap_distinct",
    tier="T2",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type
""",
)
def q153_bitmap_distinct(spark, sf_dir):
    """EXACT distinct users per event type via re-aggregatable 64-bit
    bitmap words (the groupBitmap / roaring-lite pattern).

    Scale shape: ``count(DISTINCT user_id)`` cannot be partially
    aggregated — Spark expands and shuffles the raw (type, user) key
    domain, and a daily rollup can never be merged into a monthly one
    without re-reading raw data.  A bitmap word ``(user_id div 64) ->
    bit_or(1 << (user_id mod 64))`` IS an associative partial state:
    8 bytes cover 64 users, daily words OR-merge into monthly words
    exactly, and the final count is ``sum(bit_count(word))``.  The
    query materializes the per-day word layer and then MERGES it across
    days — proving the rollup path — so the count that matches the
    oracle's flat COUNT(DISTINCT) was produced from mergeable partials,
    the way a 100 TB ingest pipeline would actually maintain it."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        bitmap_layer,
        count_distinct_words,
        merge_words,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = bitmap_layer(ev, ["event_type", "day"], "user_id")
    merged = merge_words(daily, ["event_type"])
    return count_distinct_words(merged, ["event_type"]).withColumnRenamed(
        "distinct_ids", "distinct_users"
    )



@register(
    "q162_bitmap_set_algebra",
    tier="T2",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_users
FROM (
  SELECT user_id FROM events WHERE user_id IS NOT NULL GROUP BY user_id
  HAVING bool_or(event_type = 'purchase') AND bool_or(event_type = 'error')
     AND NOT bool_or(event_type = 'signup')
)
""",
)
def q162_bitmap_set_algebra(spark, sf_dir):
    """Exact audience set algebra — users who purchased AND hit an
    error but never signed up — computed as bitwise AND/AND-NOT over
    q153's bitmap words, never by re-shuffling raw user ids per
    predicate.

    Scale shape: the oracle groups every (user, predicate) combination
    from raw events; each new predicate in the expression re-reads the
    fact table.  With per-type bitmap words the fact table is read
    ONCE: one shuffle to (type, word-index) words, a conditional
    bit_or pivots the three types into columns of the SAME word row,
    and the whole boolean expression collapses to
    ``bit_count(a & b & ~c)`` per word — 24 bytes per 64 users on the
    wire regardless of how many predicates compose.  This composability
    is WHY engines keep bitmap indexes (Druid/ClickHouse groupBitmapAnd
    family): q153 proves the census, this proves the algebra."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        word_bit_agg_when,
        word_index,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    words = (
        # NULL is not a user (oracle filters identically): a NULL id
        # would otherwise form a NULL word row invisible to bit_count
        ev.filter(F.col("user_id").isNotNull())
        .filter(F.col("event_type").isin("purchase", "error", "signup"))
        .groupBy(word_index("user_id").alias("wi"))
        .agg(
            *[
                word_bit_agg_when("user_id", f"event_type = '{t}'").alias(a)
                for t, a in (("purchase", "a"), ("error", "b"), ("signup", "c"))
            ]
        )
    )
    return words.agg(
        F.coalesce(F.sum(F.expr("bit_count(a & b & ~c)")), F.lit(0))
        .cast("bigint")
        .alias("n_users")
    )


@register(
    "q163_bitmap_distinct_rollup",
    tier="T2",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id
  FROM events WHERE user_id IS NOT NULL
)
SELECT event_type, day, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM g GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
""",
)
def q163_bitmap_distinct_rollup(spark, sf_dir):
    """Distinct-user counts at THREE granularities — per type, per day,
    per (type, day) — all answered from ONE (type, day, word) bitmap
    layer, proving the rollup reuse q153's docstring promises.

    Scale shape: ``GROUPING SETS`` with ``count(DISTINCT)`` makes Spark
    Expand the raw (user, grouping) space — every additional grouping
    set re-shuffles the fact table.  The bitmap word layer is built
    once (one fact shuffle, finest granularity), and every coarser
    distinct count is an OR-merge of word rows: two more shuffles over
    the WORD domain (users/64 x days), never over events.  A month of
    daily layers rolls up the same way without touching a single raw
    event — the maintenance path of every bitmap-backed metrics
    store."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        "user_id",
    )
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        bitmap_layer,
        count_distinct_words,
        merge_words,
    )

    layer = bitmap_layer(ev, ["event_type", "day"], "user_id")

    def _cnt(df, keys):
        return count_distinct_words(df, keys).withColumnRenamed(
            "distinct_ids", "distinct_users"
        )

    by_type = _cnt(merge_words(layer, ["event_type"]), ["event_type"]).select(
        "event_type", F.lit(None).cast("string").alias("day"), "distinct_users"
    )
    by_day = _cnt(merge_words(layer, ["day"]), ["day"]).select(
        F.lit(None).cast("string").alias("event_type"), "day", "distinct_users"
    )
    by_both = _cnt(layer, ["event_type", "day"]).select(
        "event_type", "day", "distinct_users"
    )
    return by_type.unionByName(by_day).unionByName(by_both)


@register(
    "q164_bitmap_retention",
    tier="T2",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL)
SELECT CAST(a.day AS VARCHAR) AS day, CAST(count(*) AS BIGINT) AS retained
FROM du a JOIN du b ON b.day = a.day + INTERVAL 1 DAY AND a.user_id = b.user_id
GROUP BY a.day
""",
)
def q164_bitmap_retention(spark, sf_dir):
    """Next-day retention (users active on day d AND day d+1) — the
    DAU-retention matrix cell — computed as a word-level AND between
    consecutive days of q153's bitmap layer.

    Scale shape: the oracle self-joins the distinct (day, user)
    relation on user_id — a user-domain shuffle per matrix cell, and a
    7/30-day retention matrix multiplies it.  The bitmap layer turns
    retention into a self-join on (next day, WORD INDEX): the join key
    domain is days x users/64, each matched row ANDs two 8-byte words,
    and the count is one bit_count sum.  Every other matrix offset
    (d+7, d+30) reuses the SAME layer — zero additional raw-event
    passes.  Completes the bitmap story: census (q153), boolean
    algebra (q162), rollup (q163), temporal composition (here)."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import bitmap_layer

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    layer = bitmap_layer(ev, ["day"], "user_id")
    a = layer.alias("a")
    b = layer.select(
        F.date_sub("day", 1).alias("day_prev"), F.col("wi"), F.col("w").alias("w2")
    ).alias("b")
    return (
        a.join(b, (F.col("a.day") == F.col("b.day_prev")) & (F.col("a.wi") == F.col("b.wi")))
        .groupBy(F.col("a.day").cast("string").alias("day"))
        .agg(F.sum(F.expr("bit_count(w & w2)")).cast("bigint").alias("retained"))
        .filter(F.col("retained") > 0)
    )


@register(
    "q165_bitmap_rolling_wau",
    tier="T2",
    oracle="""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events WHERE user_id IS NOT NULL),
du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
       FROM events WHERE user_id IS NOT NULL)
SELECT CAST(days.d AS VARCHAR) AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
""",
)
def q165_bitmap_rolling_wau(spark, sf_dir):
    """Rolling 7-day active users per day — the WAU curve — as a
    RANGE-framed OR over the daily bitmap layer, closing the bitmap
    suite with the sliding-window composition.

    Scale shape: q109 computes the same statistic by exploding each
    (user, day) presence into 7 window contributions and
    count-distinct-ing — shuffle grows with presences x 7.  Here the
    daily word layer (one fact shuffle) is completed to the
    days x word-index GRID (both sides domain-bounded: days by the
    time range, word indexes by users/64), and the 7-day OR runs as a
    window per word index with a RANGE frame on the day number —
    calendar gaps handled by the frame, zero additional passes over
    events.  Every window partition holds at most |days| 8-byte words.
    The same grid answers MAU (frame -29..0) with no new shuffle —
    the rollup-reuse property counting DISTINCT users can never have."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import bitmap_layer

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    layer = bitmap_layer(ev, ["day"], "user_id")
    days = layer.select("day").distinct()
    wis = layer.select("wi").distinct()
    grid = days.crossJoin(F.broadcast(wis))
    g = grid.join(layer, ["day", "wi"], "left").select(
        "day",
        "wi",
        F.coalesce("w", F.lit(0)).alias("w"),
        F.datediff("day", F.to_date(F.lit("1970-01-01"))).alias("dn"),
    )
    w7 = Window.partitionBy("wi").orderBy("dn").rangeBetween(-6, 0)
    rolled = g.select(
        "day", F.expr("bit_or(w)").over(w7).alias("w7")
    )
    return (
        rolled.groupBy(F.col("day").cast("string").alias("day"))
        .agg(F.sum(F.expr("bit_count(w7)")).cast("bigint").alias("wau"))
    )



_HLL_M = 2305843009213693951
_HLL_A, _HLL_C = 1220703125, 12345
_HLL_NUM = 2904064 * 2**56
_HLL_EMPTY = 72057594037927936  # 2^56 = an empty register's scaled term
# ln(64/V) for V = 1..64, emitted as shortest-roundtrip literals into
# BOTH SQL strings: the small-range (linear counting) correction then
# uses the SAME parsed double in each engine, so even its float math
# is bit-identical (multiply + floor of identical doubles).
_HLL_LN = "4.1588830833596715, 3.4657359027997265, 3.060270794691562, 2.772588722239781, 2.5494451709255714, 2.367123614131617, 2.2129729343043585, 2.0794415416798357, 1.9616585060234524, 1.8562979903656263, 1.7609878105613013, 1.6739764335716716, 1.5939337258981352, 1.519825753744413, 1.4508328822574619, 1.3862943611198906, 1.3256697393034558, 1.2685113254635072, 1.2144441041932312, 1.1631508098056809, 1.1143606456362487, 1.067840630001356, 1.023388867430522, 0.9808292530117262, 0.9400072584914712, 0.9007865453381899, 0.8630462173553427, 0.8266785731844679, 0.7915872533731978, 0.7576857016975165, 0.7248958788745256, 0.6931471805599453, 0.6623755218931916, 0.6325225587435105, 0.6035350218702581, 0.5753641449035618, 0.5479651707154475, 0.5212969236332861, 0.4953214372300254, 0.47000362924573563, 0.4453110166553641, 0.4212134650763035, 0.39768296766610944, 0.3746934494414107, 0.35222059358935215, 0.3302416868705768, 0.30873548164961323, 0.28768207245178085, 0.26706278524904514, 0.2468600779315258, 0.22705745063534608, 0.20763936477824455, 0.18859116980754997, 0.16989903679539742, 0.15154989812720088, 0.13353139262452257, 0.11583181552512165, 0.09844007281325251, 0.0813456394539524, 0.06453852113757116, 0.04800921918636066, 0.03174869831458027, 0.015748356968139112, 0.0"


@register(
    "q177_portable_hll",
    tier="T2",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         CAST(({_HLL_A} * (({_HLL_A} * (({_HLL_A} * CAST(user_id AS HUGEINT)
           + {_HLL_C}) % {_HLL_M}) + {_HLL_C}) % {_HLL_M}) + {_HLL_C})
           % {_HLL_M} AS BIGINT) AS h,
         user_id
  FROM events),
t AS (
  SELECT event_type, user_id, h % 64 AS bucket,
         CASE WHEN h // 64 = 0 THEN CAST(1 AS BIGINT)
              ELSE CAST(1 AS BIGINT) << length(bin(h // 64)) END AS term
  FROM h),
reg AS (SELECT event_type, bucket, min(term) AS mt FROM t GROUP BY 1, 2),
agg AS (SELECT event_type, sum(mt) AS s, count(*) AS nb FROM reg GROUP BY 1),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       FROM events GROUP BY 1),
pre AS (SELECT event_type,
               CAST(s + (64 - nb) * {_HLL_EMPTY} AS BIGINT) AS sum_term,
               CAST(64 - nb AS BIGINT) AS zero_buckets FROM agg),
raw AS (
  SELECT event_type, sum_term, zero_buckets,
         CAST((CAST('{_HLL_NUM}' AS HUGEINT)
               - CAST('{_HLL_NUM}' AS HUGEINT)
                 % (1000 * CAST(sum_term AS HUGEINT)))
              // (1000 * CAST(sum_term AS HUGEINT)) AS BIGINT) AS raw_est
  FROM pre)
SELECT r.event_type,
       CASE WHEN r.zero_buckets > 0 AND r.raw_est <= 160
            THEN CAST(floor(64.0 * ([{_HLL_LN}])[CAST(r.zero_buckets AS INT)])
                      AS BIGINT)
            ELSE r.raw_est END AS hll_est,
       e.n_exact, r.zero_buckets
FROM raw r JOIN ex e ON e.event_type = r.event_type
""",
)
def q177_portable_hll(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type, from scratch,
    with CROSS-ENGINE EXACT parity — the register values AND the final
    estimate hash-match DuckDB, upgrading the sketch tier beyond q55's
    rows-only contract.  Emitted next to the exact countDistinct so the
    query is self-evaluating (m = 64 -> ~13% standard error).

    Every step is integer-exact by construction: a 3-round LCG mix mod
    the Mersenne prime 2^61-1 (computed in DECIMAL(20,0) here /
    HUGEINT in the oracle — no int64 overflow anywhere, no engine
    float), rho via the exact bit length (``length(bin(w))`` — both
    engines' ``bin`` drops leading zeros identically), registers scaled
    as ``2^(56 - rho)`` so the harmonic sum is a plain BIGINT sum, and
    the alpha_m * m^2 / sum estimate via exact mod-subtract division in
    DECIMAL(38,0) (``(N - N % d) / d`` has zero remainder, so decimal
    division cannot round).

    Scale shape: the register layer is ONE partial-agg shuffle over
    (event_type, bucket <= 64) — min(term) combines map-side, so the
    shuffle carries keys x 64 rows regardless of event volume; registers
    OR-merge-style compose across stores/days exactly like the q153
    bitmap layer but in 64 x 8 bytes per key total.  (The exact
    countDistinct column is the self-evaluation baseline; a production
    run at 100 TB drops it and keeps only the sketch pass.)"""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    x = "CAST(user_id AS DECIMAL(20,0))"
    for _ in range(3):
        x = (
            f"CAST(({_HLL_A} * {x} + {_HLL_C}) % {_HLL_M}"
            " AS DECIMAL(20,0))"
        )
    t = ev.selectExpr(
        "event_type",
        "user_id",
        f"CAST({x} AS BIGINT) AS h",
    ).selectExpr(
        "event_type",
        "user_id",
        "pmod(h, 64) AS bucket",
        "CASE WHEN h div 64 = 0 THEN CAST(1 AS BIGINT)"
        " ELSE shiftleft(CAST(1 AS BIGINT), length(bin(h div 64))) END AS term",
    )
    reg = t.groupBy("event_type", "bucket").agg(F.min("term").alias("mt"))
    agg = reg.groupBy("event_type").agg(
        F.sum("mt").alias("s"), F.count(F.lit(1)).alias("nb")
    )
    pre = agg.selectExpr(
        "event_type",
        f"CAST(s + (64 - nb) * CAST({_HLL_EMPTY} AS BIGINT) AS BIGINT) AS sum_term",
        "CAST(64 - nb AS BIGINT) AS zero_buckets",
    )
    den = "(CAST(1000 AS DECIMAL(38,0)) * CAST(sum_term AS DECIMAL(38,0)))"
    est = pre.selectExpr(
        "event_type",
        f"CAST((CAST('{_HLL_NUM}' AS DECIMAL(38,0))"
        f" - CAST('{_HLL_NUM}' AS DECIMAL(38,0)) % {den}) / {den}"
        " AS BIGINT) AS raw_est",
        "zero_buckets",
    ).selectExpr(
        "event_type",
        # small-range (linear counting) correction — the standard HLL
        # regime switch: with empty registers and a small raw estimate,
        # m * ln(m/V) is far less biased.  The ln values come from the
        # shared 64-entry literal table, so the correction's float
        # multiply+floor is bit-identical across engines too.
        "CASE WHEN zero_buckets > 0 AND raw_est <= 160"
        f" THEN CAST(floor(64.0 * element_at(array({_HLL_LN}),"
        " CAST(zero_buckets AS INT))) AS BIGINT)"
        " ELSE raw_est END AS hll_est",
        "zero_buckets",
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "hll_est", "n_exact", "zero_buckets"
    )
