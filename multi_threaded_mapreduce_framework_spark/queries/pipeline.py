"""Training-data pipeline queries (beyond the reference's inventory).

Text analysis + dedup/similarity operators a 100 TB training-data
pipeline needs, each as an oracle-checked query over the fixture corpus.
All per-document math is JVM-side array/higher-order-function
expressions (whole-stage codegen, no Python UDFs) so the map phase
scales linearly; the only shuffles are final aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

# Tiny English stopword list for the language-ID heuristic; duplicated
# verbatim in oracle SQL strings (keep in sync).
EN_STOPWORDS = ("the", "of", "and", "is", "in", "to", "a", "for", "on", "with")
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_STOP_SPARK = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

FINGERPRINT_MOD = 1_000_000_007


@register(
    "q31_quality_score",
    tier="T2",
    oracle="""
WITH scored AS (
  SELECT lang,
         least(1.0, len(string_split(text, ' ')) / 40.0) * 0.6
         + least(1.0, (length(replace(text, ' ', ''))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0)
           * 0.4 AS q
  FROM documents)
SELECT lang, round(avg(q), 2) AS avg_quality, count(*) AS cnt
FROM scored GROUP BY lang
""",
)
def q31_quality_score(spark, sf_dir):
    """Heuristic document quality score (length + mean-word-length mix),
    averaged per language. The score itself is ``functions``-style column
    math — a representative single-pass quality filter for corpus
    curation."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_tok = F.size(ws)
    awl = F.length(F.regexp_replace("text", " ", "")) / n_tok.cast("double")
    q = (
        F.least(F.lit(1.0), n_tok / F.lit(40.0)) * 0.6
        + F.least(F.lit(1.0), awl / F.lit(8.0)) * 0.4
    )
    return (
        docs.select("lang", q.alias("q"))
        .groupBy("lang")
        .agg(
            F.round(F.avg("q"), 2).alias("avg_quality"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q32_token_stats",
    tier="T2",
    oracle="""
SELECT source,
       round(avg(len(string_split(text, ' '))), 2) AS avg_ws_tokens,
       round(avg(len(regexp_extract_all(text, '[a-z0-9]+'))), 2)
         AS avg_re_tokens,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY source
""",
)
def q32_token_stats(spark, sf_dir):
    """Token counting per source: whitespace tokens and regex word
    tokens (the BPE-ish pre-tokenizer pass), plus corpus token totals."""
    docs = load_table(spark, sf_dir, "documents")
    ws_tok = F.size(F.split("text", " "))
    re_tok = F.size(F.expr("regexp_extract_all(text, '([a-z0-9]+)', 1)"))
    return (
        docs.select("source", ws_tok.alias("wt"), re_tok.alias("rt"))
        .groupBy("source")
        .agg(
            F.round(F.avg("wt"), 2).alias("avg_ws_tokens"),
            F.round(F.avg("rt"), 2).alias("avg_re_tokens"),
            F.sum("wt").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "q33_langid",
    tier="T2",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         CASE WHEN len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL})))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.1
              THEN 'en' ELSE 'other' END AS predicted_lang
  FROM documents)
SELECT lang, predicted_lang, count(*) AS cnt
FROM scored GROUP BY lang, predicted_lang
""",
)
def q33_langid(spark, sf_dir):
    """Language-ID heuristic (stopword-ratio vote) vs. the labeled lang
    column — the confusion-matrix query a corpus-curation pipeline runs.
    The heuristic is deliberately simple/deterministic; a production
    n-gram model slots into the same column expression."""
    docs = load_table(spark, sf_dir, "documents")
    pred = F.expr(
        "CASE WHEN size(filter(split(text, ' '),"
        f" w -> w IN ({_STOP_SPARK})))"
        " / CAST(size(split(text, ' ')) AS DOUBLE) >= 0.1"
        " THEN 'en' ELSE 'other' END"
    )
    return (
        docs.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q34_fingerprint",
    tier="T2",
    oracle=f"""
WITH fp AS (
  SELECT lang,
         list_reduce(list_transform(string_split(text, ''),
                                    c -> CAST(ascii(c) AS BIGINT)),
                     (a, b) -> (a * 31 + b) % {FINGERPRINT_MOD})
           AS fingerprint
  FROM documents)
SELECT lang, count(*) AS cnt,
       count(DISTINCT fingerprint) AS distinct_fp
FROM fp GROUP BY lang
""",
)
def q34_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (polynomial hash mod p over
    character codes), then distinct-fingerprint counts per lang — the
    cheap first-stage exact-dup detector. Seeding note: Spark aggregates
    from 0 and DuckDB list_reduce seeds with the first element; these
    coincide because (0*31 + c1) % p == c1."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.expr(
        "aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)),"
        f" 0L, (a, b) -> (a * 31 + b) % {FINGERPRINT_MOD})"
    )
    return (
        docs.select("lang", fp.alias("fingerprint"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("fingerprint").alias("distinct_fp"),
        )
    )


_PRETOK_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@register(
    "q179_regex_pretokenize",
    tier="T2",
    oracle=f"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(text, '{_PRETOK_RE}')) AS tok
  FROM documents),
c AS (
  SELECT lang,
         CASE WHEN regexp_matches(tok, '^[A-Za-z]') THEN 'word'
              WHEN regexp_matches(tok, '^[0-9]') THEN 'number'
              ELSE 'punct' END AS cls,
         tok
  FROM t)
SELECT lang, cls,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
       CAST(sum(length(tok)) AS BIGINT) AS n_chars
FROM c GROUP BY lang, cls
""",
)
def q179_regex_pretokenize(spark, sf_dir):
    """BPE-style regex PRE-tokenization census: split every document
    with the GPT-2-family pre-tokenizer shape (letter runs | digit
    runs | punctuation runs — the ASCII-class core of the published
    pattern, identical semantics under Java regex and RE2 so both
    engines extract byte-identical token streams), then census token
    count / distinct tokens / character mass per (lang, class).  This
    is the statistic a tokenizer-training run computes FIRST (how much
    of the corpus is words vs numbers vs punctuation, and how large
    the pre-token vocabulary is) and complements q32's whitespace
    tokens and q138's in-word BPE pair counts.

    Scale shape: extraction is an in-row codegen'd regex (one corpus
    scan, no Python); the only shuffle is the (lang, class, token)
    partial agg for the distinct count — map-side combine collapses to
    per-partition vocabularies first, so the shuffle carries vocabulary
    rows, not token occurrences."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.explode(F.expr(f"regexp_extract_all(text, '{_PRETOK_RE}', 0)")).alias(
            "tok"
        ),
    )
    cls = (
        F.when(F.col("tok").rlike("^[A-Za-z]"), F.lit("word"))
        .when(F.col("tok").rlike("^[0-9]"), F.lit("number"))
        .otherwise(F.lit("punct"))
    )
    return (
        t.select("lang", cls.alias("cls"), "tok")
        .groupBy("lang", "cls")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("tok").cast("bigint").alias("n_distinct"),
            F.sum(F.length("tok")).cast("bigint").alias("n_chars"),
        )
    )


@register(
    "q180_arrow_doc_stats",
    tier="T2",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents GROUP BY lang
""",
)
def q180_arrow_doc_stats(spark, sf_dir):
    """Per-language document statistics with the per-doc pass computed
    by a ``mapInArrow`` kernel — promoting the Arrow-native custom-op
    tier (SURVEY §2.3.1, previously tested-only via
    ``operators/cogroup.py::arrow_token_stats``) to an oracle-declared
    query, completing the declared coverage of all three Python kernel
    tiers (mapInPandas: q171-q173, cogroup: q178, mapInArrow: here).

    The kernel never materializes pandas: batches stay Arrow
    RecordBatches end to end and the token/char counting runs in
    pyarrow.compute's C++ kernels (``split_pattern`` +
    ``list_value_length`` + ``utf8_length`` — codepoint semantics,
    matching both engines' ``length``).  The rollup stays JVM-side.

    Scale shape: one corpus scan through the Arrow kernel (zero-copy
    columnar hand-off, no shuffle), then a partial-agg rollup on the
    tiny lang domain.  mapInArrow is the tier to reach for when the
    kernel is Arrow-expressible or hands off zero-copy to numpy/C —
    it skips the Arrow->pandas->Arrow conversion tax the pandas tiers
    pay."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.split_pattern(batch.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("lang"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                ],
                names=["lang", "n_tokens", "n_chars"],
            )

    per_doc = docs.mapInArrow(
        kernel, schema="lang string, n_tokens bigint, n_chars bigint"
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
