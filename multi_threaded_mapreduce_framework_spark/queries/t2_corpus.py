"""Corpus-management and sequence-analytics queries (q61-q69):
deterministic splits, TF-IDF, event transitions, grouped
custom-Python sequence ops, and regression aggregates.

All are training-data-pipeline staples, oracle-checked via the portable
md5-bucket / math conventions (FIXTURES.md discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

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


@register(
    "q68_longest_streak",
    tier="T2",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events),
runs AS (
  SELECT user_id, count(*) AS len
  FROM seq GROUP BY user_id, event_type, rn - rnt)
SELECT user_id, max(len) AS longest_streak,
       count(*) AS n_runs
FROM runs GROUP BY user_id
""",
)
def q68_longest_streak(spark, sf_dir):
    """Per-user longest run of consecutive same-type events (plus run
    count) as native gaps-and-islands window SQL: two ``row_number``
    passes (per user, and per user+type) make ``rn - rnt`` constant
    within a run, then two integer aggregates finish the job. The
    whole plan is JVM window + hash-aggregate — no Python in the path
    (round 1 shipped the ``applyInPandas`` form as declared; it was the
    slowest query in the suite at ~10x the median, so the native plan
    is now declared and the Python form remains as the tested
    custom-sequence-operator alternate, :func:`longest_streak_pandas`).

    Scale: both windows partition by user_id and Spark reuses one hash
    shuffle + local sort for them; aggregation state is 2 longs per
    (user, type, island). All outputs are integers — exact oracle
    parity, no FP discipline needed."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_user) - F.row_number().over(w_type)).alias("island"),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_runs"),
    )


def longest_streak_pandas(spark, sf_dir):
    """Grouped ``applyInPandas`` form of :func:`q68_longest_streak` —
    the custom-sequence-operator escape hatch, kept as the tested
    alternate for logic that genuinely cannot be window SQL.

    This is the reference's reduce phase generalized: one group = one
    user's full ordered history, processed by arbitrary Python
    (MapReduceClient.h:62-64 lets reduce see the whole group too).
    Scale: state is one user's events, never the corpus; groups hash
    across executors (one shuffle) and each Arrow batch runs a
    vectorized run-length encoding, so skewless users cost O(n log n)
    for the local sort only."""

    def streaks(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        et = pdf["event_type"]
        run_id = (et != et.shift()).cumsum()
        lens = run_id.value_counts()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "longest_streak": [int(lens.max())],
                "n_runs": [int(len(lens))],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return ev.groupBy("user_id").applyInPandas(
        streaks, schema="user_id bigint, longest_streak bigint, n_runs bigint"
    )


# x is centered at 2024-01-01 (epoch day 19723): the fixture's window is
# ~30 days, so uncentered epoch-day x values (~19700) would put the
# slope's denominator through catastrophic cancellation (sum(x^2) ~ 1e9
# vs variance ~ 75). Centering makes both engines' two-pass/streaming
# covariances agree to ~1e-12, far inside the round(3).
_X_DAYS = "epoch_us(ts) / 86400000000.0 - 19723"


@register(
    "q69_regr_slope",
    tier="T2",
    oracle=f"""
SELECT user_id,
       round(regr_slope(value, {_X_DAYS}), 3) AS slope_per_day,
       round(regr_avgy(value, {_X_DAYS}), 3) AS avg_value,
       CAST(regr_count(value, {_X_DAYS}) AS BIGINT) AS n
FROM events GROUP BY user_id
""",
)
def q69_regr_slope(spark, sf_dir):
    """Per-user linear trend of `value` over time (units: value per
    day), via the built-in JVM regression aggregates — drift detection
    over a metric stream without leaving whole-stage codegen. Single
    partial+final aggregate on user_id; at 100 TB the partial phase
    reduces each map task to 4 doubles per user before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(86400000000.0) - F.lit(19723)
    return ev.groupBy("user_id").agg(
        F.round(F.regr_slope(F.col("value"), x), 3).alias("slope_per_day"),
        F.round(F.regr_avgy(F.col("value"), x), 3).alias("avg_value"),
        F.regr_count(F.col("value"), x).alias("n"),
    )


@register(
    "q185_three_step_funnel",
    tier="T2",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) AS us
  FROM events),
clicks AS (SELECT * FROM e WHERE event_type = 'click'),
matched AS (
  SELECT c.user_id, c.event_id, CAST(c.ts AS DATE) AS day
  FROM clicks c
  WHERE EXISTS (
    SELECT 1 FROM e v
    WHERE v.user_id = c.user_id AND v.event_type = 'view'
      AND (v.us > c.us OR (v.us = c.us AND v.event_id > c.event_id))
      AND EXISTS (
        SELECT 1 FROM e p
        WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
          AND (p.us > v.us OR (p.us = v.us AND p.event_id > v.event_id)))))
SELECT CAST(day AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n_matched_clicks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM matched GROUP BY day
""",
)
def q185_three_step_funnel(spark, sf_dir):
    """Three-step ORDERED sequence match — click, then a later view,
    then a later purchase, per user (the MATCH_RECOGNIZE /
    sequential-pattern shape Spark has no built-in for), reported as
    matched clicks + converting users per click-day.

    The doubly-nested EXISTS of the oracle becomes TWO chained
    reverse-running-min windows over ONE per-user pass: for every row,
    ``np`` = the earliest later purchase time; then ``mv`` = the
    earliest later VIEW that itself has a later purchase (min over
    following views of their np-tagged position) — a click matches iff
    that second minimum exists.  Order is the total (ts, event_id)
    order, so ties are deterministic and both engines agree exactly.

    Scale shape: both windows and the final day rollup ride ONE
    user_id shuffle (windows share the partition ordering; q105's
    funnel discipline) — the oracle's correlated double-EXISTS would
    be two self-joins of the event table; here no join node exists at
    all.  Generalizes to K steps as K-1 chained windows over the same
    single shuffle: :func:`k_step_funnel_matches` IS that general form
    (this query = K=3; the K=4 variant is proven against a
    triple-nested-EXISTS oracle in tests/test_round5_queries.py)."""
    ev = load_table(spark, sf_dir, "events")
    matched = k_step_funnel_matches(ev, ["click", "view", "purchase"]).select(
        "user_id", F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("day")
    )
    return matched.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_clicks"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def k_step_funnel_matches(ev, steps: list[str]):
    """Rows of ``ev`` that BEGIN a full ordered K-step funnel: an
    event of type ``steps[0]`` followed (strictly later in the total
    (ts, event_id) order, same user) by ``steps[1]``, ... then
    ``steps[-1]`` — K-1 chained reverse-running-min windows over ONE
    ``user_id`` shuffle, no self-joins (the q185 construction for any
    K).  Working back from the last step: ``_m[i]`` = the earliest
    later event of type ``steps[i]`` whose own remaining chain
    completes; a row matches iff it has type ``steps[0]`` and
    ``_m[1]`` exists."""
    ev = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev = None  # name of the chain column for steps[i+1:]
    for i in range(len(steps) - 1, 0, -1):
        cond = F.col("event_type") == steps[i]
        if prev is not None:
            cond = cond & F.col(prev).isNotNull()
        cur = f"_m{i}"
        ev = ev.withColumn(
            cur, F.min(F.when(cond, F.struct("us", "event_id"))).over(w)
        )
        prev = cur
    return ev.filter(
        (F.col("event_type") == steps[0]) & F.col(prev).isNotNull()
    )
