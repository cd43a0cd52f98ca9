"""Training-prep queries (q127-q129): vocabulary construction,
train/holdout contamination at non-broadcastable reference scale, and
skip-gram context-pair extraction.

These extend the LLM-data-pipeline tier (SURVEY.md §2.3 T2) with the
ops that turn a cleaned corpus into model inputs. Oracle-checked via
the md5-bucket / casting conventions (FIXTURES.md discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table, spread_small_scan


@register(
    "q127_vocab_ids",
    tier="T2",
    oracle="""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token)
SELECT token, tf,
       CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS vocab_id
FROM cnt
""",
)
def q127_vocab_ids(spark, sf_dir):
    """Frequency-ranked vocabulary with contiguous ids (count desc,
    token asc tiebreak) — the token->id table every tokenizer build
    starts from.

    Scale shape: the corpus-scale work is the distributed token count
    (partial-agg shuffle, map-side combine collapses each partition's
    token multiset to ~vocab size first). The total-order window then
    runs over the AGGREGATED vocabulary only — domain-bounded like
    q111's histogram (vocabularies are 10^4-10^6 rows at any corpus
    size; BPE vocabs are fixed by construction), so the single-partition
    window never sees corpus-scale data. Deterministic: ties break on
    the token itself, never on arrival order.
    """
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return cnt.select(
        "token", "tf", F.row_number().over(w).cast("bigint").alias("vocab_id")
    )


@register(
    "q128_train_holdout_leakage",
    tier="T2",
    oracle="""
WITH b AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
           % 100 AS bucket
  FROM documents),
sh AS (
  SELECT doc_id, bucket,
         list_distinct(list_transform(range(1, greatest(len(ws) - 3, 1)),
             i -> array_to_string(ws[i:i+4], ' '))) AS sh
  FROM (SELECT doc_id, bucket, string_split(text, ' ') AS ws FROM b)),
train AS (SELECT DISTINCT unnest(sh) AS p FROM sh WHERE bucket < 80),
hold AS (SELECT doc_id, unnest(sh) AS p FROM sh
         WHERE bucket >= 80 AND len(sh) > 0)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN p IN (SELECT p FROM train) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked,
       CAST(floor(sum(CASE WHEN p IN (SELECT p FROM train) THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE) * 100) AS BIGINT) AS leak_centi
FROM hold GROUP BY doc_id
HAVING sum(CASE WHEN p IN (SELECT p FROM train) THEN 1 ELSE 0 END) > 0
""",
)
def q128_train_holdout_leakage(spark, sf_dir):
    """Train->holdout shingle leakage: for every val/test document
    (q61's md5-bucket split, >= 80), the fraction of its distinct
    5-token shingles that also occur anywhere in the TRAIN split; only
    leaking docs are emitted. The pre-training twin of q98's benchmark
    decontamination, with the opposite scale posture: the reference
    side here is 80% OF THE CORPUS, so nothing broadcasts — the hit
    test is a distributed LEFT SEMI join on the shingle key (both
    sides shuffle-partition on p; AQE handles Zipf-hot shingles), then
    per-doc re-aggregation on the already-computed doc_id. This is the
    shape dedup-against-big-reference takes whenever the reference set
    outgrows executor memory.
    """
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    bucket = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) AS BIGINT)"
        )
        % 100
    )
    sh = F.expr(
        "array_distinct(transform(slice(ws, 1, greatest(size(ws) - 4, 0)),"
        " (w, i) -> concat_ws(' ', slice(ws, i + 1, 5))))"
    )
    base = docs.select(
        "doc_id", bucket.alias("bucket"), F.split("text", " ").alias("ws")
    ).select("doc_id", "bucket", sh.alias("sh"))
    train_p = (
        base.filter(F.col("bucket") < 80).select(F.explode("sh").alias("p")).distinct()
    )
    hold = base.filter(F.col("bucket") >= 80).select(
        "doc_id", F.explode("sh").alias("p")
    )
    leaked = (
        hold.join(train_p, "p", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    totals = hold.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(leaked, "doc_id")  # inner: only docs with >= 1 leak
        .select(
            "doc_id",
            "n_shingles",
            "n_leaked",
            F.floor(F.col("n_leaked") / F.col("n_shingles").cast("double") * 100)
            .cast("bigint")
            .alias("leak_centi"),
        )
    )


@register(
    "q129_skipgram_pairs",
    tier="T2",
    oracle="""
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT unnest(flatten(list_transform(generate_series(1, len(ws)), i ->
           list_transform(list_filter([-2, -1, 1, 2],
                                      j -> i + j >= 1 AND i + j <= len(ws)),
                          j -> struct_pack(center := ws[i],
                                           context := ws[i + j]))))) AS pr
  FROM t)
SELECT pr.center AS center, pr.context AS context,
       CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY 1, 2
""",
)
def q129_skipgram_pairs(spark, sf_dir):
    """Skip-gram (center, context) pair counts with a +/-2 token window
    — the co-occurrence statistics word2vec-style embedding training
    consumes (and PMI/feature pipelines reuse).

    Scale shape: pair generation is a pure IN-ROW array expression
    (positions x offsets, bounds-filtered), so the corpus scan emits
    pairs with no join and no per-row Python; the only shuffle is the
    partial-agg count on (center, context), whose map-side combine
    collapses each partition to ~active-pair-vocabulary size. Compare
    q26 (contiguous bigrams): same skeleton, wider window, offset
    asymmetry preserved (left and right context both counted).
    """
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    pairs = F.expr(
        "flatten(transform(ws, (w, i) ->"
        " filter(transform(array(-2, -1, 1, 2),"
        "        j -> IF(i + j >= 0 AND i + j < size(ws),"
        "                struct(w AS center, ws[i + j] AS context), NULL)),"
        "        x -> x IS NOT NULL)))"
    )
    return (
        docs.select(F.split("text", " ").alias("ws"))
        .select(F.explode(pairs).alias("pr"))
        .select("pr.center", "pr.context")
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
