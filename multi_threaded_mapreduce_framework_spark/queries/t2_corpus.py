"""Corpus-management queries (q61-q62): deterministic splits and TF-IDF.

Both are training-data-pipeline staples. Both are oracle-checked via the
portable md5-bucket / math conventions (FIXTURES.md discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q61_deterministic_split",
    tier="T2",
    oracle="""
WITH b AS (
  SELECT lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
           % 100 AS bucket
  FROM documents)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS cnt
FROM b GROUP BY 1, 2
""",
)
def q61_deterministic_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment via md5-bucket
    of the stable doc key — reproducible across engines, runs, and
    cluster sizes (unlike TABLESAMPLE/rand()), and stable under corpus
    growth: adding documents never reassigns existing ones. The split
    is a map-side expression, so at 100 TB it doubles as a partition
    column for the physical layout."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) AS BIGINT)"
        )
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q62_tfidf_top_terms",
    tier="T2",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.term, tf.doc_id,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT term, doc_id, tfidf
FROM scored
ORDER BY tfidf DESC, term, doc_id
LIMIT 25
""",
)
def q62_tfidf_top_terms(spark, sf_dir):
    """TF-IDF: top-25 (term, doc) pairs by tf * ln(N/df).

    One tokenization: tf aggregates (doc, term) counts, and df derives
    from tf (tf rows are already distinct (doc, term) pairs, so df is a
    plain count — no second corpus scan and no countDistinct shuffle).
    The tf->df join is left to the size-based planner: vocabulary grows
    with the corpus, so a forced broadcast would be wrong at scale; the
    1-row doc count does broadcast. Ordering ties broken by (term,
    doc_id); the score is rounded before ordering so rank boundaries
    are identical on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("term", "doc_id", tfidf.alias("tfidf"))
        .orderBy(F.desc("tfidf"), F.asc("term"), F.asc("doc_id"))
        .limit(25)
    )


@register(
    "q63_event_transitions",
    tier="T2",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, count(*) AS cnt
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def q63_event_transitions(spark, sf_dir):
    """Event-type transition matrix (Markov counts) per the per-user
    event sequence — one lag window and one aggregation, both on the
    same user_id shuffle key, so Spark plans a single exchange serving
    both (the window's partitioning is reused by the partial agg)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
