"""Tier T2 — round-7 band A: lakehouse MERGE, coreset selection,
tokenizer/loader math, quantization audit, rank fusion.

- q230: MERGE INTO (upsert + delete) applied as one full-outer join —
  the lakehouse CDC-apply primitive, promoted from q123's SCD2 pattern
  to a declared query (VERDICT r06 item 8).
- q232: greedy k-center (farthest-point) coreset selection over the
  embedding corpus — the diversity-maximizing subset-selection
  primitive (Sener & Savarese, "Active Learning for CNNs: A Core-Set
  Approach", ICLR 2018) behind embedding-coverage data curation.
- q233: tokenizer fertility census — subwords-per-word and OOV share
  per language under a frequency vocabulary with character fallback
  (the sentencepiece-eval metric for "how expensive is this language
  to tokenize").
- q234: DoReMi-style exponentiated-gradient domain-reweighting step
  (Xie et al. 2023): one multiplicative-weights update of per-domain
  mixture weights from per-domain excess-loss scores.
- q235: int8 scalar-quantization error audit for the embedding store
  (per-dim min/max scaling — the ANN-serving compression everyone
  ships; measure the reconstruction error, don't guess it).
- q236: reciprocal-rank fusion of two curation scorers (quality
  heuristic + DSIR), the standard cutoff-RRF law retrieval stacks use
  to combine rankings without score calibration.

Reference note: beyond-reference capabilities (the reference,
MapReduceFramework.cpp:1-377, is a single-shape map/sort/shuffle/reduce
library); declared per the builder brief's training-data-pipeline
rubric under the standard oracle conventions (FIXTURES.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.queries.t2_pretrain import (
    dsir_imp_micro_ctes,
)
from multi_threaded_mapreduce_framework_spark.sources import (
    load_table,
    spread_small_scan,
)

# ------------------------------------------------------------------ q230
# CDC law (deterministic from the orders fixture): every ordering
# customer sends one change row — custkey % 10 == 0 is a DELETE, the
# rest are UPSERTs adding the customer's order total (exact cents);
# custkey % 7 == 3 additionally sends a NEW-key row (custkey + 10^7),
# exercising the not-matched INSERT branch.
_MERGE_NEW_OFFSET = 10_000_000


@register(
    "q230_merge_into_upsert",
    tier="T2",
    oracle=f"""
WITH cdc0 AS (
  SELECT o_custkey AS k,
         CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS delta_cents
  FROM orders GROUP BY o_custkey),
cdc AS (
  SELECT k, CASE WHEN k % 10 = 0 THEN 'D' ELSE 'U' END AS op, delta_cents
  FROM cdc0
  UNION ALL
  SELECT k + {_MERGE_NEW_OFFSET}, 'U', delta_cents
  FROM cdc0 WHERE k % 7 = 3),
tgt AS (SELECT c_custkey AS k,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM customer)
SELECT coalesce(tgt.k, cdc.k) AS custkey,
       CAST(coalesce(tgt.bal_cents, 0) + coalesce(cdc.delta_cents, 0)
            AS BIGINT) AS bal_cents,
       CASE WHEN tgt.k IS NULL THEN 'I'
            WHEN cdc.k IS NULL THEN 'K'
            ELSE 'U' END AS op
FROM tgt FULL OUTER JOIN cdc ON tgt.k = cdc.k
WHERE cdc.op IS NULL OR cdc.op <> 'D'
""",
)
def q230_merge_into_upsert(spark, sf_dir):
    """MERGE INTO (the lakehouse CDC-apply): apply a change batch to a
    dimension snapshot in ONE pass — WHEN MATCHED AND op='D' THEN
    DELETE / WHEN MATCHED THEN UPDATE (balance += delta) / WHEN NOT
    MATCHED THEN INSERT — emitting the post-merge table with each
    row's applied action ('U' updated, 'I' inserted, 'K' kept).  This
    is Delta/Iceberg's MERGE semantics expressed engine-level: a
    single FULL OUTER join on the merge key with per-branch CASE
    logic, which is exactly the shuffle-join plan those table formats
    generate underneath (VERDICT r06 item 8 — the q123 SCD2 pattern
    promoted to a declared upsert query).

    Scale shape: one shuffle of each side on the merge key (or zero if
    both sides are bucketed by key, the q112 layout); the CDC batch is
    typically <<= target so the planner broadcasts it and the target
    never moves.  Money stays exact integer cents (fixture prices are
    exact cents; round-to-integer of price*100 is identical IEEE in
    both engines), so the driver hash gate applies to the FULL merged
    table, not a sample."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cdc0 = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.expr("CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)").alias(
            "delta_cents"
        )
    )
    cdc = cdc0.select(
        "k",
        F.when(F.col("k") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "delta_cents",
    ).unionByName(
        cdc0.filter(F.col("k") % 7 == 3).select(
            (F.col("k") + F.lit(_MERGE_NEW_OFFSET)).alias("k"),
            F.lit("U").alias("op"),
            "delta_cents",
        )
    )
    tgt = cust.select(
        F.col("c_custkey").alias("k"),
        F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("bal_cents"),
    )
    j = tgt.alias("t").join(cdc.alias("c"), "k", "full_outer")
    return (
        j.filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.col("k").alias("custkey"),
            (
                F.coalesce(F.col("t.bal_cents"), F.lit(0))
                + F.coalesce(F.col("c.delta_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("bal_cents"),
            F.when(F.col("t.bal_cents").isNull(), F.lit("I"))
            .when(F.col("c.delta_cents").isNull(), F.lit("K"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )


# ------------------------------------------------------------------ q232
_KCENTER_K = 5


def _duck_l2(a: str, b: str) -> str:
    """Squared-L2 as the SAME left-to-right fold Spark's ``aggregate``
    runs: list_reduce seeds with the first element, Spark with 0.0, and
    IEEE 0 + x == x, so the two folds are bit-identical on identical
    double inputs."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def _kcenter_oracle(k: int) -> str:
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),",
        "c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),",
        "d1 AS (SELECT e.vec_id, e.v, "
        + _duck_l2("e.v", "c1.v")
        + " AS mind FROM e, c1 WHERE e.vec_id <> c1.vec_id),",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"p{r} AS (SELECT vec_id, v, mind FROM d{r - 1}"
            f" ORDER BY mind DESC, vec_id LIMIT 1),"
        )
        if r < k:
            parts.append(
                f"d{r} AS (SELECT d.vec_id, d.v,"
                f" least(d.mind, {_duck_l2('d.v', f'p{r}.v')}) AS mind"
                f" FROM d{r - 1} d, p{r} WHERE d.vec_id <> p{r}.vec_id),"
            )
    sel = [
        "SELECT CAST(1 AS BIGINT) AS round, vec_id,"
        " CAST(0 AS BIGINT) AS dist_micro FROM c1"
    ]
    for r in range(2, k + 1):
        sel.append(
            f"SELECT {r}, vec_id, CAST(floor(1000000 * mind) AS BIGINT)"
            f" FROM p{r}"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + "\n" + "\nUNION ALL ".join(sel)


@register("q232_kcenter_coreset", tier="T2", oracle=_kcenter_oracle(_KCENTER_K))
def q232_kcenter_coreset(spark, sf_dir, k: int = _KCENTER_K):
    """Greedy k-center (farthest-point) coreset selection: starting
    from the lowest vec_id, repeatedly pick the vector FARTHEST (max
    over points of min squared-L2 distance to the chosen centers) —
    the 2-approximation to the k-center objective and the classic
    coreset / diversity-sampling pass for embedding-curated training
    data (Sener & Savarese 2018).  Output: (round, vec_id,
    dist_micro) — the selection trajectory plus each pick's coverage
    radius, which doubles as the corpus' covering-radius curve.

    Engine shape (round 11 — guide §1.2/§5): each round is a 1-row
    TakeOrderedAndProject argmax read to the driver as a scalar (the
    q94/q102 convergence-read discipline), and the chosen center
    vector — a bounded ``dim``-length array — is inlined back as a
    LITERAL into the next round's mind expression, so round r is ONE
    map-side pass over the corpus scan computing
    ``least(d(v,c1), ..., d(v,c_{r-1}))`` with zero joins, zero
    broadcasts and zero localCheckpoints (the r10 form checkpointed
    the (vec_id, v, mind) relation once per round, which at k=5 made
    four corpus-sized block-manager materializations and the documented
    1.2–3.6 s iterative suite variance; the literal-center form holds
    no blocks at all).  The min-dist update stays k-center's exact
    delta; k passes for k picks is the textbook cost either way.
    Cross-engine exactness: distances are the identical left-to-right
    IEEE fold in both engines (see ``_duck_l2``) — driver-read center
    components are exact float64 round trips — ``least`` is an exact
    (roundoff-free) min over that fold chain, argmax tiebreak vec_id,
    and the reported radius is floor(1e6 * d) of a bit-identical
    double, computed in-plan — hash-exact, no float rounding
    convention needed."""
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )

    def dist_to(center: list) -> "F.Column":
        cv = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with("v", cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, w: acc + w,
        )

    c1 = e.orderBy(F.asc("vec_id")).limit(1).first()
    picks = [(1, c1["vec_id"], 0)]
    chosen = [c1["vec_id"]]
    mind = dist_to(c1["v"])
    for rnd in range(2, k + 1):
        top = (
            e.filter(~F.col("vec_id").isin(chosen))
            .select(
                "vec_id",
                "v",
                mind.alias("mind"),
                F.floor(F.lit(1000000.0) * mind).cast("bigint").alias(
                    "dist_micro"
                ),
            )
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .first()
        )
        picks.append((rnd, top["vec_id"], top["dist_micro"]))
        chosen.append(top["vec_id"])
        if rnd < k:
            mind = F.least(mind, dist_to(top["v"]))
    return spark.createDataFrame(
        picks, "round bigint, vec_id bigint, dist_micro bigint"
    )


# ------------------------------------------------------------------ q233
_FERT_VOCAB = 500


@register(
    "q233_tokenizer_fertility",
    tier="T2",
    oracle=f"""
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
             FROM documents),
vc AS (SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
       ORDER BY c DESC, w LIMIT {_FERT_VOCAB}),
t AS (SELECT lang,
             CASE WHEN vc.w IS NOT NULL THEN 1
                  ELSE CAST(length(tok.w) AS BIGINT) END AS sub,
             CASE WHEN vc.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok LEFT JOIN vc ON tok.w = vc.w)
SELECT lang,
       CAST(count(*) AS BIGINT) AS words,
       CAST(sum(sub) AS BIGINT) AS subwords,
       CAST(1000 * sum(sub) // count(*) AS BIGINT) AS fertility_milli,
       CAST(1000 * sum(oov) // count(*) AS BIGINT) AS oov_milli
FROM t GROUP BY lang
""",
)
def q233_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility census: under a frequency vocabulary (the
    corpus' top-500 words) with character fallback — a known word costs
    1 subword, an OOV word falls back to its characters — report per
    language the words seen, subwords produced, fertility (subwords
    per 1000 words) and OOV share.  Fertility is THE sentencepiece/BPE
    evaluation metric for cross-lingual cost ("how many tokens does a
    Chinese document pay per word vs English"), and it prices the
    loader math: q204/q217's packing bins and q212's token budget all
    consume subword counts that this census calibrates per language.

    Plan: one tokenization explode; the vocabulary is a
    TakeOrderedAndProject over the word-count partial agg (vocab-sized
    relation, top-V by frequency with word tiebreak); membership is a
    left join the planner broadcasts at V=500; the census is one
    partial-agg shuffle on lang.  All-integer output (milli units) —
    hash-exact.  At 100 TB the only corpus-sized stages are the
    explode and its count partial-agg, both map-combining."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
    vc = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_FERT_VOCAB)
        .select(F.col("w").alias("vw"))
    )
    t = tok.join(F.broadcast(vc), tok.w == vc.vw, "left").select(
        "lang",
        F.when(F.col("vw").isNotNull(), F.lit(1))
        .otherwise(F.length("w").cast("bigint"))
        .alias("sub"),
        F.when(F.col("vw").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("words"),
        F.sum("sub").cast("bigint").alias("subwords"),
        F.expr("CAST(1000 * sum(sub) div count(1) AS BIGINT)").alias(
            "fertility_milli"
        ),
        F.expr("CAST(1000 * sum(oov) div count(1) AS BIGINT)").alias("oov_milli"),
    )


# ------------------------------------------------------------------ q234
# Literal exp tables (the q177 portable-sketch discipline): computed
# ONCE here in Python and emitted as identical integer literals into
# both engines, so the weight law contains no engine libm call at all.
# EG weights are invariant to a common loss shift (w_d ∝ exp(loss_d) =
# exp(max)·exp(-(max-loss_d)); the normalizer cancels exp(max)), so the
# law shifts by the max loss, quantizes the excess to CENTI, and splits
# exp(-d_centi/100) = exp(-a)·exp(-b/100) with a = d_centi div 100
# (integer part, table _EG_WA — 0 beyond 14 where the micro weight
# underflows) and b = d_centi % 100 (table _EG_WB, 100 entries).
import math as _math  # noqa: E402

_EG_WA = tuple(
    (a, int(_math.floor(1e6 * _math.exp(-a) + 0.5))) for a in range(15)
)
_EG_WB = tuple(
    (b, int(_math.floor(1e6 * _math.exp(-b / 100.0) + 0.5)))
    for b in range(100)
)


@register(
    "q234_doremi_step",
    tier="T2",
    oracle=f"""
WITH tk AS (SELECT lang,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
                   CAST(sum(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY lang),
l AS (SELECT lang, CAST(1000 * chars // toks AS BIGINT) AS loss_milli
      FROM tk),
mx AS (SELECT CAST(max(loss_milli) AS BIGINT) AS max_loss FROM l),
d AS (SELECT lang, loss_milli,
             CAST((max_loss - loss_milli) // 10 AS BIGINT) AS d_centi
      FROM l, mx),
wa(a, ew_a) AS (VALUES {', '.join(f'({a}, {w})' for a, w in _EG_WA)}),
wb(b, ew_b) AS (VALUES {', '.join(f'({b}, {w})' for b, w in _EG_WB)}),
w AS (SELECT lang, loss_milli,
             CAST(coalesce(CAST(ew_a AS BIGINT), 0) * CAST(ew_b AS BIGINT)
                  // 1000000 AS BIGINT) AS ew_micro
      FROM d LEFT JOIN wa ON wa.a = d_centi // 100
             JOIN wb ON wb.b = d_centi % 100),
t AS (SELECT CAST(sum(ew_micro) AS BIGINT) AS tot_micro FROM w)
SELECT lang, loss_milli,
       CAST(1000000 * ew_micro // tot_micro AS BIGINT) AS weight_micro
FROM w, t
""",
)
def q234_doremi_step(spark, sf_dir):
    """DoReMi-style domain-reweighting step (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    one exponentiated-gradient (multiplicative-weights) update of the
    per-domain mixture — w_d ∝ w0_d * exp(eta * excess_loss_d),
    normalized — with uniform w0 and eta=1.  The excess-loss scores
    are pluggable (DoReMi uses proxy-model minus reference-model loss
    per domain); here the deterministic stand-in is each language's
    mean word length in milli (chars per 1000 tokens), which makes the
    UPDATE LAW — the part this query declares — exactly reproducible.
    The output is the next data-mix row a q207-style epoch planner
    consumes.

    Engine parity discipline (r8 verdict item 2 — the q177 literal-
    table form): EG weights are shift-invariant, so the law subtracts
    the max loss, quantizes the excess to integer CENTI, and looks the
    weight exp(-d_centi/100) up as the product of two PRE-COMPUTED
    integer-micro literal tables (_EG_WA for the integer part, _EG_WB
    for the centi fraction) — exp() never executes in either engine,
    so the gate depends on zero libm calls; normalization stays pure
    integer.  Plan: one scan partial-aggs to 5 domain rows; everything
    after is a 5-row fold with the 1-row max/normalizer and the two
    literal tables broadcast."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    tk = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("toks"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    l_ = tk.select(
        "lang", F.expr("CAST(1000 * chars div toks AS BIGINT)").alias("loss_milli")
    )
    # max-shift via a global window over the 5-row DOMAIN relation
    # (bounded by |langs|, the q111 allowlist class) — cheaper than a
    # separate max aggregate + normalizer-style cross join; the two
    # literal tables inline as bigint array lookups (pure projection,
    # no joins — the r9 bench flagged the join form at 2.6x vs r7).
    d = l_.select(
        "lang",
        "loss_milli",
        F.expr(
            "CAST((max(loss_milli) OVER () - loss_milli) div 10 AS BIGINT)"
        ).alias("d_centi"),
    )
    wa_arr = "array(" + ", ".join(f"{w}L" for _, w in _EG_WA) + ")"
    wb_arr = "array(" + ", ".join(f"{w}L" for _, w in _EG_WB) + ")"
    w = d.select(
        "lang",
        "loss_milli",
        F.expr(
            f"CAST(CASE WHEN d_centi div 100 < {len(_EG_WA)} THEN"
            f" element_at({wa_arr}, CAST(d_centi div 100 AS INT) + 1)"
            f" ELSE 0L END"
            f" * element_at({wb_arr}, CAST(d_centi % 100 AS INT) + 1)"
            " div 1000000 AS BIGINT)"
        ).alias("ew_micro"),
    )
    # w feeds both the output and the normalizer: checkpoint the 5-row
    # relation so the corpus scan+agg runs ONCE (the plan otherwise
    # duplicates the whole subplan under the normalizer side)
    w = w.localCheckpoint()
    t = w.agg(F.sum("ew_micro").cast("bigint").alias("tot_micro"))
    return w.crossJoin(F.broadcast(t)).select(
        "lang",
        "loss_milli",
        F.expr("CAST(1000000 * ew_micro div tot_micro AS BIGINT)").alias(
            "weight_micro"
        ),
    )


# ------------------------------------------------------------------ q235
@register(
    "q235_int8_quant_error",
    tier="T2",
    oracle="""
WITH x AS (SELECT label, i, v[i] AS x
           FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
                unnest(generate_series(1, len(v))) AS t(i)),
mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY i),
q AS (SELECT label,
             CASE WHEN mx > mn
                  THEN floor((x - mn) * 255 / (mx - mn)) ELSE 0 END AS qi,
             x, mn, mx
      FROM x JOIN mm USING (i)),
e AS (SELECT label, qi,
             CAST(floor(1e12 * (x - (mn + qi * (mx - mn) / 255))
                             * (x - (mn + qi * (mx - mn) / 255))) AS BIGINT)
               AS err_p12
      FROM q)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vals,
       CAST(sum(err_p12) AS BIGINT) AS sse_p12,
       CAST(sum(err_p12) // count(*) AS BIGINT) AS mse_p12,
       CAST(count(*) FILTER (WHERE qi <= 0 OR qi >= 255) AS BIGINT)
         AS n_saturated
FROM e GROUP BY label
""",
)
def q235_int8_quant_error(spark, sf_dir):
    """Int8 scalar-quantization error audit for the embedding store:
    quantize every dimension to 8 bits with per-dimension min/max
    scaling (qi = floor((x-mn)*255/(mx-mn)) — the compression every
    ANN-serving stack ships first), dequantize, and census the
    reconstruction error per label: value count, summed and mean
    squared error (in 1e-12 units), and how many values sit on the
    saturated end bins (the tell that a dimension needs clipping or a
    non-uniform codebook).  q184's PQ codebook is the next compression
    tier; this is the cheap one you measure FIRST — q210's
    measure-don't-guess discipline applied to the quantizer.

    Cross-engine exactness without a float convention: the whole chain
    (subtract, scale, floor, dequantize, square) is exact-IEEE ops on
    identical doubles, so per-element floor(1e12 * err^2) is the SAME
    integer in both engines and the census is integer partial-aggs —
    hash-exact.  Plan: one posexplode feeds the per-dim min/max
    partial agg (64-row result, broadcast back) and the error census;
    the corpus crosses the wire once as (dim-keyed) partials."""
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings")).select(
        "label", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    x = e.select(
        "label", F.posexplode("v").alias("i0", "x")
    ).select("label", (F.col("i0") + 1).alias("i"), "x")
    mm = x.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = x.join(F.broadcast(mm), "i").select(
        "label",
        F.expr(
            "CASE WHEN mx > mn THEN floor((x - mn) * 255 / (mx - mn))"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("qi"),
        "x",
        "mn",
        "mx",
    )
    err = q.select(
        "label",
        "qi",
        F.expr(
            "CAST(floor(1e12 * (x - (mn + qi * (mx - mn) / 255))"
            " * (x - (mn + qi * (mx - mn) / 255))) AS BIGINT)"
        ).alias("err_p12"),
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vals"),
        F.sum("err_p12").cast("bigint").alias("sse_p12"),
        F.expr("CAST(sum(err_p12) div count(1) AS BIGINT)").alias("mse_p12"),
        F.sum(
            F.when((F.col("qi") <= 0) | (F.col("qi") >= 255), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_saturated"),
    )


# ------------------------------------------------------------------ q236
_RRF_L = 200  # per-scorer candidate depth
_RRF_K = 60  # the standard RRF dampening constant
_RRF_TOP = 20


@register(
    "q236_rrf_fusion",
    tier="T2",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w, text
           FROM documents),
q AS (SELECT doc_id,
        least(1.0, len(w) / 40.0) * 0.6
        + least(1.0, (length(replace(text, ' ', ''))
                      / CAST(len(w) AS DOUBLE)) / 8.0) * 0.4 AS qual
      FROM t),
{dsir_imp_micro_ctes()},
topq AS (SELECT doc_id, row_number() OVER (ORDER BY qual DESC, doc_id) AS rq
         FROM (SELECT doc_id, qual FROM q
               ORDER BY qual DESC, doc_id LIMIT {_RRF_L})),
topi AS (SELECT doc_id, row_number() OVER (ORDER BY imp_micro DESC, doc_id)
                AS ri
         FROM (SELECT doc_id, imp_micro FROM imp
               ORDER BY imp_micro DESC, doc_id LIMIT {_RRF_L})),
f AS (SELECT coalesce(topq.doc_id, topi.doc_id) AS doc_id,
             CAST(coalesce(rq, {_RRF_L + 1}) AS BIGINT) AS rank_q,
             CAST(coalesce(ri, {_RRF_L + 1}) AS BIGINT) AS rank_i
      FROM topq FULL OUTER JOIN topi ON topq.doc_id = topi.doc_id)
SELECT doc_id,
       CAST(1000000 // ({_RRF_K} + rank_q)
            + 1000000 // ({_RRF_K} + rank_i) AS BIGINT) AS rrf_scaled,
       rank_q, rank_i
FROM f ORDER BY rrf_scaled DESC, doc_id LIMIT {_RRF_TOP}
""",
)
def q236_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of two curation scorers — the heuristic
    quality score (q95/q225's law) and DSIR target-likeness (q206's
    integer imp_micro ranking, portable-ln: no libm in the gate) —
    under the standard cutoff-RRF law:
    each scorer contributes 1e6/(60 + rank-within-its-top-200), a doc
    absent from a list takes the cutoff rank 201, fused top-20 by
    summed score with doc_id tiebreak.  RRF is how retrieval stacks
    (and ensemble curation pipelines) combine rankings WITHOUT score
    calibration — q225 measured that these two scorers barely agree;
    this query is the production answer to that finding: fuse, don't
    pick.  Integer arithmetic end-to-end (scaled reciprocal with
    integer div), so the fused ranking is hash-exact.

    Plan: each scorer's candidate set is a TakeOrderedAndProject
    (never a global sort); in-subset ranks come from windows over the
    ALREADY-LIMITED 200-row relations (the q111/q225 bounded
    global-window allowlist class); the fusion is a 200x200-row full
    outer join and a final top-20.  The cutoff law is what makes this
    scale-safe: no rank over the corpus is ever materialized."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_pretrain import (
        dsir_doc_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    chars = F.length(F.regexp_replace("text", " ", ""))
    qual = F.least(F.lit(1.0), F.size(w) / 40.0) * 0.6 + F.least(
        F.lit(1.0), (chars / F.size(w).cast("double")) / 8.0
    ) * 0.4
    top_q = (
        docs.select("doc_id", qual.alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(_RRF_L)
    )
    top_i = (
        dsir_doc_scores(spark, sf_dir)
        .select("doc_id", F.col("imp_micro").alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(_RRF_L)
    )
    wrank = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    rq = top_q.select("doc_id", F.row_number().over(wrank).alias("rq"))
    ri = top_i.select("doc_id", F.row_number().over(wrank).alias("ri"))
    f = rq.join(ri, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rq", F.lit(_RRF_L + 1)).cast("bigint").alias("rank_q"),
        F.coalesce("ri", F.lit(_RRF_L + 1)).cast("bigint").alias("rank_i"),
    )
    return (
        f.select(
            "doc_id",
            F.expr(
                f"CAST(1000000 div ({_RRF_K} + rank_q)"
                f" + 1000000 div ({_RRF_K} + rank_i) AS BIGINT)"
            ).alias("rrf_scaled"),
            "rank_q",
            "rank_i",
        )
        .orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
        .limit(_RRF_TOP)
    )
