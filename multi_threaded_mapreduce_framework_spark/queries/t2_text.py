"""Tier T2 — text / temporal extension queries (SURVEY.md §2.3,
q23-q27 + q30): sessionization, tumbling windows, dedup, n-grams,
near-duplicate detection, corpus stats. These are the LLM-training-data
pipeline operators the 100 TB design point cares about; scale notes per
query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@register(
    "q23_sessionize",
    tier="T2",
    oracle=f"""
WITH x AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS num_sessions
FROM x GROUP BY user_id
""",
)
def q23_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): #sessions per user.

    A session starts where the gap to the previous event exceeds the
    threshold; session count = count of session starts. Single shuffle on
    user_id serves both the lag window and the final aggregate. Gap math
    in integer microseconds so Spark and the oracle truncate identically.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_start = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    return (
        ev.select("user_id", is_start.alias("is_start"))
        .groupBy("user_id")
        .agg(F.sum("is_start").cast("bigint").alias("num_sessions"))
    )


@register(
    "q24_window_tumbling",
    tier="T2",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def q24_window_tumbling(spark, sf_dir):
    """1-hour tumbling windows x event_type (batch form; the streaming
    demo in ``streaming/`` converges to this same result). Session tz is
    UTC so window boundaries equal the oracle's naive date_trunc."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@register(
    "q25_exact_dedup",
    tier="T2",
    oracle="""
SELECT lang, count(*) AS num_docs
FROM (SELECT arg_min(lang, doc_id) AS lang
      FROM documents GROUP BY lower(trim(text))) t
GROUP BY lang
""",
)
def q25_exact_dedup(spark, sf_dir):
    """Exact dedup on normalized text, keep min doc_id; survivors per
    lang. Implemented as min(struct(doc_id, lang)) so one aggregation
    carries the survivor's attributes — no join-back (one shuffle fewer,
    and the map-side partial min collapses duplicates before shuffle,
    which is the whole point of exact dedup at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("norm"))
        .agg(F.min(F.struct("doc_id", "lang")).alias("surv"))
        .groupBy(F.col("surv.lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("num_docs"))
    )


@register(
    "q26_ngram_bigrams",
    tier="T2",
    oracle="""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
big AS (
  SELECT w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM words)
SELECT w1, w2, count(*) AS cnt
FROM big WHERE w2 IS NOT NULL
GROUP BY w1, w2
ORDER BY cnt DESC, w1, w2 LIMIT 20
""",
)
def q26_ngram_bigrams(spark, sf_dir):
    """Top-20 word bigrams. Bigrams are built *inside each row* with
    array ops (transform over the word array) — no posexplode+window and
    therefore no per-document shuffle; the only shuffle is the final
    (partially aggregated) bigram count."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " (w, i) -> struct(w AS w1, ws[i + 1] AS w2))"
    )
    return (
        docs.select(F.split("text", " ").alias("ws"))
        .select(F.explode(bigrams).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@register(
    "q27_jaccard_neardup",
    tier="T2",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 500),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2,
       round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 2) AS jaccard
FROM inter
JOIN sz s1 ON s1.doc_id = d1
JOIN sz s2 ON s2.doc_id = d2
WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5
""",
)
def q27_jaccard_neardup(spark, sf_dir):
    """Document pairs with token-set Jaccard >= 0.5 (exact).

    Token-inverted-index self-join -> per-pair intersection counts ->
    Jaccard via |A|+|B|-|A∩B|, with a LOSSLESS size-band block on the
    join: J = i/(n1+n2-i) <= min(n1,n2)/max(n1,n2) because i <= min and
    the union >= max, so any qualifying pair satisfies
    2*min(n1,n2) >= max(n1,n2) at threshold 0.5. The band prunes
    candidate pairs inside the join condition — before the intersection
    count is ever aggregated — bounding the quadratic blow-up to
    similarly-sized documents (SURVEY §7 M3 risk note). Token-set sizes
    are computed map-side (size of the distinct token array) and ride
    along the explode, so the band needs no extra join or aggregate;
    the two size-lookup joins of the unbanded form disappear too.

    Exact brute force on a capped slice (doc_id < 500): the fixture
    vocabulary is tiny, so token buckets are dense and the qualifying
    output itself is inherently O(n^2) — the uncapped version of this
    op does not exist at scale. The scale path is MinHash-LSH
    (``q35_minhash_lsh``), which bounds candidates by bucket collision
    instead of joining every shared token.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .select("doc_id", F.size("toks").alias("n"), F.explode("toks").alias("w"))
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-band block: necessary condition for J >= 0.5
            & (F.least("a.n", "b.n") * 2 >= F.greatest("a.n", "b.n")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.n").alias("n1"),
            F.col("b.n").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.filter(jac >= 0.5)
        .select("d1", "d2", F.round(jac, 2).alias("jaccard"))
    )


@register(
    "q30_text_stats",
    tier="T2",
    oracle="""
SELECT lang, count(*) AS cnt, round(avg(n_chars), 2) AS avg_chars,
       count(DISTINCT source) AS num_sources
FROM documents GROUP BY lang
""",
)
def q30_text_stats(spark, sf_dir):
    """Corpus stats per language (count / mean length / distinct sources)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("source").alias("num_sources"),
    )


@register(
    "q125_window_sliding",
    tier="T2",
    oracle="""
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
           AS win_start,
         value
  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
GROUP BY 1
""",
)
def q125_window_sliding(spark, sf_dir):
    """SLIDING 1-hour windows every 15 minutes (q24 is the tumbling
    special case): each event lands in exactly 4 overlapping windows.
    Spark's ``window(ts, '1 hour', '15 minutes')`` expands the 4
    assignments map-side (a row-local explode, no self-join) and the
    partial agg collapses before the single shuffle — the same plan
    shape at any slide/width ratio. The oracle derives the same 4
    aligned window starts per event arithmetically (15-minute buckets
    minus k slides); both engines' windows align on epoch-aligned
    15-minute boundaries, and the session tz is UTC so boundaries
    agree."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "cnt",
            "sum_value",
        )
    )
