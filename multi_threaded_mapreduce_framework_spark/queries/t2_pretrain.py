"""Tier T2 — pretraining-corpus data operations (round-6 continuation).

Four operator families that a production LLM pretraining pipeline runs
between raw-corpus ingest and the data loader, none previously
oracle-declared:

- q205: exact duplicated-SPAN census (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better" — substring-level exact
  dedup, the suffix-array pass re-expressed as n-gram islands);
- q206: DSIR importance weighting (Xie et al. 2023 — n-gram importance
  resampling of a raw corpus toward a target distribution);
- q207: mixture rebalance / epochs-to-target math (the LLaMA/Pile-style
  per-source upsampling plan);
- q208: embedding-level eval-set decontamination (semantic sibling of
  the q98/q128 shingle contamination checks).

Reference note: all are beyond-reference capabilities (the reference,
MapReduceFramework.cpp:1-377, is a single-shape map/sort/shuffle/reduce
library); declared per the builder brief's training-data-pipeline
rubric under the standard oracle conventions (FIXTURES.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.queries.t2_dedup import (
    COSINE_NEARDUP_THRESHOLD,
)
from multi_threaded_mapreduce_framework_spark.sources import (
    load_table,
    spread_small_scan,
)

# ------------------------------------------------------------------ q205
_SPAN_G = 5  # n-gram width, matches q101's passage unit


@register(
    "q205_duplicate_span_census",
    tier="T2",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
tot AS (
  SELECT lang, CAST(sum(len(w)) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM t GROUP BY lang),
g AS (
  SELECT doc_id, lang, CAST(i AS BIGINT) AS pos,
         array_to_string(w[i+1:i+{_SPAN_G}], ' ') AS gram
  FROM t, UNNEST(range(len(w) - {_SPAN_G} + 1)) AS u(i)),
dup AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
  GROUP BY gram HAVING count(*) >= 2),
p AS (
  SELECT g.doc_id, g.lang, g.pos, g.pos + {_SPAN_G} AS fin
  FROM g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, lang, pos, fin,
         CASE WHEN pos > coalesce(max(fin) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM p),
isl2 AS (
  SELECT doc_id, lang, pos, fin,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM isl),
spans AS (
  SELECT doc_id, lang, isl_id, max(fin) - min(pos) AS span_len
  FROM isl2 GROUP BY doc_id, lang, isl_id),
per_lang AS (
  SELECT lang,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_dup,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(span_len) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY lang)
SELECT tot.lang, tot.n_docs,
       CAST(coalesce(n_docs_dup, 0) AS BIGINT) AS n_docs_dup,
       CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       total_tokens,
       CAST(1000 * coalesce(dup_tokens, 0) // total_tokens AS BIGINT)
         AS dup_milli
FROM tot LEFT JOIN per_lang USING (lang)
""",
)
def q205_duplicate_span_census(spark, sf_dir):
    """Exact duplicated-substring census (Lee et al. 2022): per
    language, the MAXIMAL token spans covered by 5-grams that occur in
    two or more distinct documents — span count, tokens inside
    duplicated spans, and the dup-token rate in milli-units.  This is
    the measurement pass of substring-level exact dedup (the
    suffix-array "dedup spans, not documents" recipe): q25 removes
    whole duplicate documents, q101 ranks hot shingles; this query
    answers *how much of each language's token stream is duplicated
    text*, the number that decides whether span-cutting is worth it.

    The suffix-array formulation is inherently sequential; the
    distributed re-expression is exact because a duplicated substring
    of length >= G is equivalently a run of duplicated G-grams, so
    maximal duplicated spans are the merged islands of the per-doc
    duplicated-gram intervals [pos, pos+G).  Three bounded stages:
    (1) gram census — one partial-aggregated shuffle on the gram key
    (min(doc_id) != max(doc_id) IS the >= 2-distinct-docs test, so no
    distinct pre-shuffle and no countDistinct state); Zipf-hot grams
    partial-agg map-side.  (2) flag-back join
    on the gram key (vocabulary-sized, size-based planner picks the
    strategy).  (3) island merge — per-doc windows (doc-bounded, never
    corpus-bounded) compute the running max-end interval merge, then
    one lang census.  At 100 TB each stage shuffles rows no wider than
    (doc_id, pos) pairs; the gram strings themselves cross the wire
    once, into the census.
    """
    G = _SPAN_G
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    tot = t.groupBy("lang").agg(
        F.sum(F.size("w")).cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    grams = t.select(
        "doc_id",
        "lang",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(w) >= {G} THEN "
                f"transform(sequence(0, size(w) - {G}), "
                f"i -> array_join(slice(w, i + 1, {G}), ' ')) "
                "ELSE array() END"
            )
        ).alias("pos", "gram"),
    ).withColumn("pos", F.col("pos").cast("bigint"))
    # r12 (guide §2.3 aggregate-before-shuffle): "gram occurs in >= 2
    # distinct docs" is exactly min(doc_id) != max(doc_id) over the
    # gram's rows — ONE partial-aggregated exchange on the gram key
    # instead of the (doc, gram) distinct exchange FOLLOWED by the gram
    # count exchange (the old form shuffled every distinct (doc, gram)
    # pair; this shuffles one (min, max) partial per gram per
    # partition).  Paired A/B at sf0.1 is a wash (0.96-1.00) — the
    # removed exchange is corpus-sized only at scale.  (Checkpointing
    # the gram explode to feed both passes measured 1.06x SLOWER and
    # was dropped — same finding as q224's trigram explode.)
    dup = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("gram")
    )
    p = grams.join(dup, "gram").select(
        "doc_id", "lang", "pos", (F.col("pos") + G).alias("fin")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = p.withColumn(
        "new_isl",
        (F.col("pos") > F.coalesce(F.max("fin").over(w_prev), F.lit(-1)))
        .cast("bigint"),
    ).withColumn("isl_id", F.sum("new_isl").over(w_run))
    spans = isl.groupBy("doc_id", "lang", "isl_id").agg(
        (F.max("fin") - F.min("pos")).alias("span_len")
    )
    per_lang = spans.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs_dup"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("span_len").cast("bigint").alias("dup_tokens"),
    )
    # left join from totals: a language with NO duplicated span still
    # gets its census row (zeros) — the "is dedup worth it" answer is
    # just as real when it is "no".
    return tot.join(per_lang, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_docs_dup", F.lit(0)).cast("bigint").alias("n_docs_dup"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        "total_tokens",
        F.expr(
            "CAST(1000 * coalesce(dup_tokens, 0) div total_tokens AS BIGINT)"
        ).alias("dup_milli"),
    )


# ------------------------------------------------------------------ q206
_DSIR_TOPK = 20

# The per-token log-ratio, quantized to integer micro.  ONE string used
# verbatim on the Spark side and in the oracle SQL, over the portable-ln
# columns (lnl = ln(c_en+1), lnr = ln(c_all+1), lndl = ln(t_en+vocab),
# lndr = ln(t_all+vocab)) — all four bit-identical across engines, so
# the floor is boundary-safe: both engines floor the SAME double.
_LR_MICRO = (
    "CAST(floor(1000000.0 * ((lnl - lndl) - (lnr - lndr)) + 0.5) AS BIGINT)"
)
_DSIR_LNS = {"lnl": "kl", "lnr": "kr", "lndl": "kdl", "lndr": "kdr"}


def dsir_imp_micro_ctes() -> str:
    """DuckDB CTE block ending in ``imp(doc_id, lang, imp_micro)`` —
    the oracle mirror of :func:`dsir_doc_scores` (same portable-ln
    stages, same ``_LR_MICRO`` quantization, same integer sum).  Shared
    by the q206 / q225 / q236 oracles so the three gates rank by the
    exact same scorer."""
    from multi_threaded_mapreduce_framework_spark.functions.portable_math import (
        apply_stages_sql,
        ln_stages,
    )

    r0 = (
        "SELECT dsir_allc.tok AS tok, COALESCE(c_en, 0) + 1 AS kl, "
        "c_all + 1 AS kr, t_en + vocab AS kdl, t_all + vocab AS kdr "
        "FROM dsir_allc LEFT JOIN dsir_enc ON dsir_allc.tok = dsir_enc.tok, "
        "dsir_v, dsir_te"
    )
    rln = apply_stages_sql(r0, ln_stages(_DSIR_LNS))
    return f"""
dsir_t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           FROM documents),
dsir_allc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_all
              FROM dsir_t GROUP BY tok),
dsir_enc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_en
             FROM dsir_t WHERE lang = 'en' GROUP BY tok),
dsir_v AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
                  CAST(sum(c_all) AS BIGINT) AS t_all FROM dsir_allc),
dsir_te AS (SELECT CAST(coalesce(sum(c_en), 0) AS BIGINT) AS t_en
            FROM dsir_enc),
dsir_r AS (SELECT tok, {_LR_MICRO} AS lr_micro FROM ({rln})),
imp AS (SELECT doc_id, min(dsir_t.lang) AS lang,
               CAST(sum(lr_micro) AS BIGINT) AS imp_micro
        FROM dsir_t JOIN dsir_r ON dsir_t.tok = dsir_r.tok
        GROUP BY doc_id)"""


@register(
    "q206_dsir_importance",
    tier="T2",
    oracle=f"""
WITH {dsir_imp_micro_ctes()}
SELECT doc_id, lang, imp_micro FROM imp
ORDER BY imp_micro DESC, doc_id LIMIT {_DSIR_TOPK}
""",
)
def q206_dsir_importance(spark, sf_dir):
    """DSIR importance weighting (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by sum over its token occurrences of ln(p_target / q_raw), where
    p/q are add-one-smoothed unigram models of the target slice (here
    lang='en') and the raw corpus; return the top-20 most target-like
    documents.  This is the selection pass that tilts a 100 TB crawl
    toward a curated target (Wikipedia/books in the paper) without a
    quality classifier — cheap n-gram statistics only.

    Plan: ONE tokenization explode feeds both unigram models (the
    target model filters the same exploded relation — no second corpus
    scan); the log-ratio table is vocabulary-sized and joins back to
    the token stream on the gram key (size-based planner decides
    broadcast vs shuffle, correct either way since vocabulary grows
    with the corpus); the corpus totals read off the aggregated
    vocabulary relation itself (r12 — no re-exploding scalar
    subtrees).  The per-doc sum
    is one partial-aggregated shuffle on doc_id, and the top-20 is a
    TakeOrderedAndProject over per-doc rows — never a global sort of
    the corpus.  Tiebreak doc_id.  The score is an INTEGER (micro
    units): each token's log-ratio is computed with the portable ln
    (functions/portable_math.py — bit-identical across engines, no
    libm in the gate), quantized to micro, and summed in integer
    arithmetic, so the ranking key is order-free and hash-exact.
    """
    return (
        dsir_doc_scores(spark, sf_dir)
        .orderBy(F.desc("imp_micro"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
        .select("doc_id", "lang", "imp_micro")
    )


def dsir_doc_scores(spark, sf_dir):
    """Shared DSIR scorer: every document with its integer-micro
    importance sum (columns: doc_id, lang, imp_micro).  One definition
    used by q206, the q225 scorer-agreement audit, AND q236's RRF
    fusion, so all three rank by exactly the same scorer.  ln is the
    portable form (functions/portable_math.py): both engines evaluate
    the identical sequence of IEEE +,-,*,/ operations, so the
    per-token micro quantization floors the same double — the gate no
    longer depends on any libm call agreeing bitwise (the r8 verdict's
    remaining-risk item).  The Spark side evaluates it as ONE
    Arrow-batched kernel over the vocab-bounded log-ratio relation
    (``portable_ln_np`` — bit-identical to the staged SQL form the
    DuckDB oracle runs, law-tested; the SQL form's ~500-node CASE
    trees cost the optimizer ~2 s of fixed planning overhead per
    action, an r9 bench finding)."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    # r11 note: a fused conditional aggregation (count + sum(when
    # lang='en')) was tried here to save the second groupBy pass and
    # the reconciliation join; paired A/B measured it SLOWER (2.45 vs
    # 2.03 s median at sf0.1) — the lang='en' filter pushes below the
    # explode, so the "extra" English pass only explodes 1/5 of the
    # corpus, while the fused form drags `lang` and a second agg
    # buffer through the full-corpus aggregation.  The two-pass form
    # stands (OPTIMIZATION_r11.md).
    allc = t.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c_all"))
    enc = (
        t.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_en"))
    )
    @pandas_udf("bigint")
    def lr_micro_udf(kl, kr, kdl, kdr):
        import numpy as np
        import pandas as pd

        from multi_threaded_mapreduce_framework_spark.functions.portable_math import (
            portable_ln_np,
        )

        lr = (
            portable_ln_np(kl.to_numpy(np.int64))
            - portable_ln_np(kdl.to_numpy(np.int64))
        ) - (
            portable_ln_np(kr.to_numpy(np.int64))
            - portable_ln_np(kdr.to_numpy(np.int64))
        )
        # same quantization expression as the oracle's _LR_MICRO
        return pd.Series(np.floor(1000000.0 * lr + 0.5).astype(np.int64))

    # r12 (VERDICT r11 item 7, measured): vocab / t_all / t_en used to
    # be two scalar aggregates OVER allc/enc — but each was a second
    # consumer of an unmaterialized aggregate, so Catalyst re-derived
    # them from scratch and the corpus explode ran FIVE times per
    # action (allc, enc, v's allc, te's enc, final join probe), plus
    # two BroadcastNestedLoopJoin scalar attaches.  The totals now read
    # off the aggregated VOCABULARY relation itself via an
    # unpartitioned window (domain-bounded — q127's vocabulary-window
    # class; vocabularies are 1e4-1e6 rows at any corpus size): corpus
    # explodes 5 -> 3, BNLJ 2 -> 0, zero added jobs.  Paired A/B at
    # sf0.1 is a wash (0.98x) — the win is the two removed corpus
    # passes, which the fixture's 31-token vocabulary cannot see.
    # (Checkpointing allc/enc/r instead measured 1.22x SLOWER — three
    # eager vocab-sized jobs cost more than the saved re-explodes at
    # this SF; the pair-count fold (explode once to (doc,tok) counts)
    # measured a wash with a heavier materialization — both recorded
    # here per the measure-first rule.)
    w_vocab = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = (
        allc.join(enc, "tok", "left")
        .select(
            "tok",
            "c_all",
            F.coalesce("c_en", F.lit(0)).alias("c_en0"),
            F.count(F.lit(1)).over(w_vocab).cast("bigint").alias("vocab"),
            F.sum("c_all").over(w_vocab).cast("bigint").alias("t_all"),
            F.sum(F.coalesce("c_en", F.lit(0)))
            .over(w_vocab)
            .cast("bigint")
            .alias("t_en"),
        )
        .select(
            "tok",
            lr_micro_udf(
                F.expr("c_en0 + 1"),
                F.expr("c_all + 1"),
                F.expr("t_en + vocab"),
                F.expr("t_all + vocab"),
            ).alias("lr_micro"),
        )
    )
    return (
        t.join(r, "tok")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.sum("lr_micro").cast("bigint").alias("imp_micro"),
        )
    )


# ------------------------------------------------------------------ q207
# Target mixture shares in milli-units; must sum to 1000.  The spec is
# the training run's data-mix config (a LLaMA-style table: upsample the
# tails, cap the head) — a literal dimension table, broadcast by size.
_MIX_SPEC = (("en", 300), ("de", 175), ("fr", 175), ("es", 175), ("zh", 175))


@register(
    "q207_mixture_epochs",
    tier="T2",
    oracle=f"""
WITH tk AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS tokens
            FROM documents GROUP BY lang),
spec(lang, target_milli) AS
  (VALUES {', '.join(f"('{l}', {m})" for l, m in _MIX_SPEC)}),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_total FROM tk)
SELECT tk.lang, tokens,
       CAST(1000 * tokens // t_total AS BIGINT) AS natural_milli,
       CAST(target_milli AS BIGINT) AS target_milli,
       CAST(target_milli * t_total // 1000 AS BIGINT) AS desired_tokens,
       CAST(1000 * (target_milli * t_total // 1000) // tokens AS BIGINT)
         AS rate_milli,
       CAST((target_milli * t_total // 1000 + tokens - 1) // tokens AS BIGINT)
         AS epochs
FROM tk JOIN spec USING (lang), tot
""",
)
def q207_mixture_epochs(spark, sf_dir):
    """Data-mix rebalance math (the LLaMA / Pile upsampling plan): given
    a target mixture share per language and one epoch's token budget
    (= the corpus total), compute each language's sampling rate and the
    number of epochs of that language the loader must draw — rate over
    1000 milli-units means upsampling (the tail languages repeat;
    epochs is the repeat count), under 1000 means the head is
    subsampled.  This one small table IS the loader config a
    pretraining run consumes; getting it exactly right (integer
    milli-unit math, floor/ceil conventions pinned by the oracle) is
    what keeps two independent implementations of the loader fed with
    identical streams.

    Plan: the corpus collapses to a 5-row per-lang token census in one
    partial-aggregated shuffle; everything after operates on
    aggregated rows — the literal mix-spec dimension joins broadcast,
    and the 1-row grand total broadcasts into the rate arithmetic.
    All integer: hash-exact at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens")
    )
    spec = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(_MIX_SPEC), "lang string, target_milli bigint"
        )
    )
    tot = tk.agg(F.sum("tokens").cast("bigint").alias("t_total"))
    desired = F.expr("CAST(target_milli * t_total div 1000 AS BIGINT)")
    return (
        tk.join(spec, "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn("desired_tokens", desired)
        .select(
            "lang",
            "tokens",
            F.expr("CAST(1000 * tokens div t_total AS BIGINT)").alias(
                "natural_milli"
            ),
            "target_milli",
            "desired_tokens",
            F.expr("CAST(1000 * desired_tokens div tokens AS BIGINT)").alias(
                "rate_milli"
            ),
            F.expr(
                "CAST((desired_tokens + tokens - 1) div tokens AS BIGINT)"
            ).alias("epochs"),
        )
    )


# ------------------------------------------------------------------ q208
_DECON_BLOCKS = 8  # train-side hash blocks; eval replicates to each


@register(
    "q208_eval_decontamination",
    tier="T2",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
ev AS (SELECT v FROM e WHERE vec_id % 20 = 0),
tr AS (SELECT * FROM e WHERE vec_id % 20 <> 0),
mx AS (SELECT tr.vec_id, tr.label,
              max(list_cosine_similarity(tr.v, ev.v)) AS m
       FROM tr CROSS JOIN ev GROUP BY tr.vec_id, tr.label)
SELECT label, CAST(count(*) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN m >= {COSINE_NEARDUP_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contam,
       round(max(m), 4) AS max_cos
FROM mx GROUP BY label
""",
)
def q208_eval_decontamination(spark, sf_dir):
    """Embedding-level eval-set decontamination: flag every training
    vector whose cosine to ANY held-out eval vector (the deterministic
    5% split vec_id % 20 = 0) reaches the q37 near-dup threshold, and
    report the per-label contamination census.  The semantic sibling
    of q98/q128's shingle contamination: n-gram checks miss paraphrase
    leakage; this is the pass that catches it (used for benchmark
    decontamination in Phi/GPT-class data pipelines).

    Plan — decontamination as a map-shaped scan: the eval set is
    benchmark-sized (fixed, small; it does NOT grow with the crawl),
    so it plays the broadcast side.  Train rows hash into
    {_DECON_BLOCKS} blocks; eval rows replicate to every block key
    (explode of a literal key sequence — the broadcast-hash-join
    topology expressed as a grouped kernel, q37's blocked-GEMM law
    with one side pinned).  ONE shuffle co-locates each train block
    with the whole eval matrix, a numpy matmul per group computes each
    train row's max cosine (pairs never materialize as rows), and a
    per-label census folds the result.  The train side crosses the
    wire exactly once and the driver holds nothing; at 100 TB the
    block count scales with executors while eval replication stays
    benchmark-sized x blocks.  Cosine formula = q37's
    dot/sqrt(n2a*n2b), the proven list_cosine_similarity parity.
    """
    import numpy as np
    import pandas as pd

    thr = COSINE_NEARDUP_THRESHOLD
    B = _DECON_BLOCKS
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    tr = e.filter(F.col("vec_id") % 20 != 0).select(
        F.pmod(F.xxhash64("vec_id"), F.lit(B)).alias("blk"),
        "vec_id",
        "label",
        "embedding",
        F.lit(False).alias("is_ev"),
    )
    ev = (
        e.filter(F.col("vec_id") % 20 == 0)
        .select(
            F.explode(F.expr(f"sequence(0, {B - 1})")).alias("blk0"),
            "vec_id",
            "label",
            "embedding",
            F.lit(True).alias("is_ev"),
        )
        .select(
            F.col("blk0").cast("bigint").alias("blk"),
            "vec_id",
            "label",
            "embedding",
            "is_ev",
        )
    )

    def kernel(key, pdf):
        is_ev = pdf["is_ev"].to_numpy()
        t_idx = np.nonzero(~is_ev)[0]
        e_idx = np.nonzero(is_ev)[0]
        if len(t_idx) == 0 or len(e_idx) == 0:
            return pd.DataFrame({"vec_id": [], "label": [], "m": []}).astype(
                {"vec_id": "int64", "label": "int32", "m": "float64"}
            )
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        tm, em = mat[t_idx], mat[e_idx]
        n2t = (tm * tm).sum(axis=1)
        n2e = (em * em).sum(axis=1)
        # same scalar formula as q37 / list_cosine_similarity
        sims = (tm @ em.T) / np.sqrt(np.outer(n2t, n2e))
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy()[t_idx],
                "label": pdf["label"].to_numpy()[t_idx],
                "m": sims.max(axis=1),
            }
        )

    mx = (
        tr.unionByName(ev)
        .groupBy("blk")
        .applyInPandas(kernel, "vec_id bigint, label int, m double")
    )
    return mx.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
        F.sum((F.col("m") >= thr).cast("bigint")).cast("bigint").alias("n_contam"),
        F.round(F.max("m"), 4).alias("max_cos"),
    )


# ------------------------------------------------------------------ q211
@register(
    "q211_source_kl_drift",
    tier="T2",
    oracle="""
WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
allc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_all FROM t GROUP BY tok),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c_all) AS BIGINT) AS t_all FROM allc),
sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_s
       FROM t GROUP BY source, tok),
st AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS t_s FROM sc GROUP BY source),
grid AS (SELECT st.source, allc.tok, c_all, t_s FROM st CROSS JOIN allc),
kl AS (SELECT grid.source,
              sum( ((coalesce(c_s, 0) + 1.0) / (t_s + vocab))
                 * ln( ((coalesce(c_s, 0) + 1.0) / (t_s + vocab))
                     / ((c_all + 1.0) / (t_all + vocab)) ) ) AS kl
       FROM grid LEFT JOIN sc ON sc.source = grid.source
                             AND sc.tok = grid.tok, v
       GROUP BY grid.source)
SELECT st.source, t_s AS n_tokens, round(kl, 4) AS kl_drift
FROM kl JOIN st USING (source)
""",
)
def q211_source_kl_drift(spark, sf_dir):
    """Per-source distribution drift: KL(P_source || P_corpus) over
    add-1-smoothed unigram models — the curation monitor that catches
    a source going off-distribution (spam floods, scraper breakage,
    boilerplate takeover) long before any downstream eval does.  A
    production crawl pipeline tracks exactly this number per
    source/domain per snapshot; sources whose drift jumps get
    quarantined (q183's row-level sibling at the source level).

    The smoothed KL needs the FULL vocabulary grid per source (absent
    tokens contribute probability mass 1/(T_s+V)), so both engines
    compute the same dense source x vocab relation: the per-source
    census (|sources| rows) broadcasts into the vocabulary table —
    grid size is |sources| x |vocab|, which grows with the VOCABULARY,
    not the corpus — then one left join against observed (source, tok)
    counts and one per-source sum.  ONE tokenization feeds all three
    aggregates.  4 dp ln discipline (q62's).
    """
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    # ONE corpus-sized shuffle: the (source, tok) census; the corpus
    # model, the vocab total, and the per-source totals all REDUCE from
    # it (checkpointed so the three derivations don't re-tokenize)
    sc = (
        t.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_s"))
        .localCheckpoint()
    )
    allc = sc.groupBy("tok").agg(F.sum("c_s").cast("bigint").alias("c_all"))
    v = allc.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c_all").cast("bigint").alias("t_all"),
    )
    st = sc.groupBy("source").agg(F.sum("c_s").cast("bigint").alias("t_s"))
    grid = allc.crossJoin(F.broadcast(st)).crossJoin(F.broadcast(v))
    p_s = (F.coalesce(F.col("c_s"), F.lit(0)) + 1.0) / (
        F.col("t_s") + F.col("vocab")
    )
    p_all = (F.col("c_all") + 1.0) / (F.col("t_all") + F.col("vocab"))
    kl = (
        grid.join(sc, ["source", "tok"], "left")
        .groupBy("source")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_all)), 4).alias("kl_drift"))
    )
    return kl.join(st, "source").select(
        "source", F.col("t_s").alias("n_tokens"), "kl_drift"
    )


# ------------------------------------------------------------------ q212
@register(
    "q212_quota_prefix_select",
    tier="T2",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
         least(1.0, len(string_split(text, ' ')) / 40.0) * 0.6
         + least(1.0, (length(replace(text, ' ', ''))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0)
           * 0.4 AS q
  FROM documents),
tot AS (SELECT lang, CAST(sum(t) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM scored GROUP BY lang),
r AS (SELECT s.*, coalesce(sum(t) OVER (PARTITION BY lang
          ORDER BY q DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM scored s),
sel AS (SELECT r.lang, r.doc_id, r.t, r.q FROM r JOIN tot USING (lang)
        WHERE prefix < total_tokens // 2)
SELECT tot.lang, n_docs, total_tokens,
       CAST(count(sel.doc_id) AS BIGINT) AS n_selected,
       CAST(coalesce(sum(sel.t), 0) AS BIGINT) AS tokens_selected,
       CAST(coalesce(min(floor(sel.q * 100)), 0) AS BIGINT) AS cutoff_centi
FROM tot LEFT JOIN sel USING (lang)
GROUP BY tot.lang, n_docs, total_tokens
""",
)
def q212_quota_prefix_select(spark, sf_dir):
    """Token-budget curation (the FineWeb-Edu-style "take the best
    docs until the budget is spent" pass): per language, rank documents
    by the q95 quality score and select greedily until half the
    language's token budget is reached (the crossing document is
    included); census of the cut — docs/tokens selected and the
    quality floor the budget bought.  Rank-then-cut differs from q95's
    fixed-threshold gate: the threshold here is DERIVED from the
    budget, which is how curation actually runs when the training plan
    (q207) fixes token counts first.

    The greedy fill is closed-form over the (q DESC, doc_id) prefix
    sum — a doc is selected iff its EXCLUSIVE prefix < quota — so one
    lang-partitioned window computes it exactly in both engines; no
    iterative selection state.  Window partitions are lang-bounded
    (q197/q111 caveat: a language too large for one task moves to the
    two-level distributed prefix-scan law).  Quality is exact IEEE
    double arithmetic (mult/div/least — no transcendentals), so the
    ordering and the floor(q*100) cutoff are bit-identical across
    engines; everything else is integer.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.size(F.split("text", " ")).cast("bigint")
    chars = F.length(F.regexp_replace("text", " ", ""))
    q = F.least(F.lit(1.0), t / 40.0) * 0.6 + F.least(
        F.lit(1.0), (chars / t.cast("double")) / 8.0
    ) * 0.4
    scored = docs.select("doc_id", "lang", t.alias("t"), q.alias("q"))
    tot = scored.groupBy("lang").agg(
        F.sum("t").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = scored.withColumn(
        "prefix", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint")
    )
    sel = r.join(tot.select("lang", "total_tokens"), "lang").filter(
        F.col("prefix") < F.expr("total_tokens div 2")
    )
    agg = sel.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("t").cast("bigint").alias("tokens_selected"),
        F.min(F.floor(F.col("q") * 100)).cast("bigint").alias("cutoff_centi"),
    )
    return tot.join(agg, "lang", "left").select(
        "lang",
        "n_docs",
        "total_tokens",
        F.coalesce("n_selected", F.lit(0)).cast("bigint").alias("n_selected"),
        F.coalesce("tokens_selected", F.lit(0))
        .cast("bigint")
        .alias("tokens_selected"),
        F.coalesce("cutoff_centi", F.lit(0)).cast("bigint").alias("cutoff_centi"),
    )


# ------------------------------------------------------------------ q215
_N_SHARDS = 64
# portable shard law: Knuth multiplicative hash over a prime-bounded
# id — ((doc_id % 1000003) * 2654435761) stays far below 2^63, so the
# arithmetic is exact in BOTH engines with no overflow semantics in
# play (Spark 4 runs ANSI; an unbounded 64-bit LCG would raise there
# and silently wrap in DuckDB's HUGEINT path)
_SHARD_EXPR = f"CAST(((doc_id % 1000003) * 2654435761) % {_N_SHARDS} AS BIGINT)"


@register(
    "q215_shard_balance_audit",
    tier="T2",
    oracle=f"""
WITH d AS (SELECT {_SHARD_EXPR} AS shard,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS t
           FROM documents),
s AS (SELECT shard, CAST(sum(t) AS BIGINT) AS toks,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY shard)
SELECT CAST(count(*) AS BIGINT) AS n_shards_used,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       CAST(min(toks) AS BIGINT) AS min_shard_tokens,
       CAST(max(toks) AS BIGINT) AS max_shard_tokens,
       CAST(1000 * max(toks) // (sum(toks) // count(*)) AS BIGINT)
         AS imbalance_milli
FROM s
""",
)
def q215_shard_balance_audit(spark, sf_dir):
    """Training-shard balance audit: hash documents into the loader's
    {_N_SHARDS} shards with a portable multiplicative hash and report
    the token balance — max-shard over mean-shard in milli-units.  A
    data loader feeds one shard per worker; an imbalanced sharding is
    a straggler at every epoch boundary, so this audit runs before any
    training job is launched.  The shard law is the same expression in
    both engines (prime-bounded multiplicative hash — exact integer
    arithmetic with no 64-bit overflow, portable where xxhash64 is
    not), so the census is hash-exact end to end.

    Plan: one partial-aggregated shuffle to the shard census
    ({_N_SHARDS} rows), then a single fold over it — the corpus
    crosses the wire as {_N_SHARDS} partial rows per task, nothing
    else.  All integer.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.expr(_SHARD_EXPR).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("t"),
    )
    s = d.groupBy("shard").agg(F.sum("t").cast("bigint").alias("toks"))
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards_used"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.min("toks").cast("bigint").alias("min_shard_tokens"),
        F.max("toks").cast("bigint").alias("max_shard_tokens"),
        F.expr(
            "CAST(1000 * max(toks) div (sum(toks) div count(1)) AS BIGINT)"
        ).alias("imbalance_milli"),
    )


# ------------------------------------------------------------------ q216
_COV_G = 3  # gram width: 3-word grams give a non-degenerate census on
# the fixture (5-grams are ~all unique in synthetic text)


@register(
    "q216_eval_ngram_coverage",
    tier="T2",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
g AS (SELECT DISTINCT lang, doc_id % 20 = 0 AS is_eval,
             array_to_string(w[i+1:i+{_COV_G}], ' ') AS gram
      FROM t, UNNEST(range(len(w) - {_COV_G - 1})) AS u(i)),
ev AS (SELECT DISTINCT lang, gram FROM g WHERE is_eval),
tr AS (SELECT DISTINCT lang, gram FROM g WHERE NOT is_eval),
cov AS (SELECT ev.lang, CAST(count(*) AS BIGINT) AS n_eval_grams,
               CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_covered
        FROM ev LEFT JOIN tr ON ev.lang = tr.lang AND ev.gram = tr.gram
        GROUP BY ev.lang)
SELECT lang, n_eval_grams, n_covered,
       CAST(1000 * n_covered // n_eval_grams AS BIGINT) AS coverage_milli
FROM cov
""",
)
def q216_eval_ngram_coverage(spark, sf_dir):
    """Eval-set n-gram coverage (the memorization-surface metric): per
    language, the fraction of the held-out split's distinct 3-grams
    that also occur in the training split.  q98/q128 FLAG contaminated
    documents; this measures the aggregate overlap a benchmark report
    quotes ("x% of eval n-grams appear in training data") — the number
    that calibrates how much of an eval score could be recall rather
    than generalization.

    Plan: one tokenization explodes grams with the split flag computed
    map-side from doc_id (deterministic split — no membership table);
    each side reduces to DISTINCT (lang, gram) via partial-aggregated
    shuffles on the gram key; the coverage join is gram-keyed
    (vocabulary-of-grams-sized) and the census folds per lang.  The
    eval split here is the doc_id % 20 sample; in production the eval
    side is a pinned benchmark (bounded), making the coverage join a
    broadcast — this declared form covers the harder case where it is
    not.
    """
    G = _COV_G
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    g = t.select(
        "lang",
        (F.col("doc_id") % 20 == 0).alias("is_eval"),
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {G} THEN "
                f"transform(sequence(0, size(w) - {G}), "
                f"i -> array_join(slice(w, i + 1, {G}), ' ')) "
                "ELSE array() END"
            )
        ).alias("gram"),
    ).distinct()
    ev = g.filter("is_eval").select("lang", "gram").distinct()
    tr = g.filter(~F.col("is_eval")).select("lang", F.col("gram").alias("tgram"))
    cov = (
        ev.join(
            tr,
            (ev.lang == tr.lang) & (ev.gram == tr.tgram),
            "left",
        )
        .groupBy(ev.lang)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_grams"),
            F.sum(F.when(F.col("tgram").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return cov.select(
        "lang",
        "n_eval_grams",
        "n_covered",
        F.expr("CAST(1000 * n_covered div n_eval_grams AS BIGINT)").alias(
            "coverage_milli"
        ),
    )
