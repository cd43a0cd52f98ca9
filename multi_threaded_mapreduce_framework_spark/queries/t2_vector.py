"""Tier T2 — embedding similarity queries (SURVEY.md §2.3, q28-q29).

Brute-force cosine is the oracle-checkable baseline at test scale; the
100 TB path is LSH bucketing (``q38_ann_lsh_bucketed`` in pipeline.py)
which prunes the candidate set before any distance math runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.functions.vector import cosine_similarity
from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


def _scored_vs_probe(spark, sf_dir, probe_id: int = 0):
    """All embeddings scored by cosine against the probe vector.

    The probe (1 row) is broadcast — a map-only plan with zero shuffle of
    the big side, which is exactly the shape you want scoring 100 TB of
    embeddings against a query vector.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == probe_id).select(
        F.col("embedding").cast("array<double>").alias("probe_emb")
    )
    return (
        emb.filter(F.col("vec_id") != probe_id)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            cosine_similarity("embedding", "probe_emb").alias("sim"),
        )
    )


@register(
    "q28_cosine_topk",
    tier="T2",
    oracle="""
WITH probe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                (SELECT e FROM probe)) AS sim
  FROM embeddings WHERE vec_id <> 0)
SELECT vec_id, round(sim, 4) AS cos_sim
FROM scored ORDER BY sim DESC, vec_id LIMIT 10
""",
)
def q28_cosine_topk(spark, sf_dir):
    """Top-10 nearest embeddings to vec_id=0 by cosine (brute force).

    Ordering/selection on the RAW double score (round only in output) so
    the top-k set matches the oracle's selection exactly;
    TakeOrderedAndProject keeps it a per-partition top-k, not a global
    sort.
    """
    return (
        _scored_vs_probe(spark, sf_dir)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("sim", 4).alias("cos_sim"))
    )


@register(
    "q29_knn_label",
    tier="T2",
    oracle="""
WITH probe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0),
top5 AS (
  SELECT vec_id, label,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                (SELECT e FROM probe)) AS sim
  FROM embeddings WHERE vec_id <> 0
  ORDER BY sim DESC, vec_id LIMIT 5)
SELECT label, CAST(count(*) AS BIGINT) AS votes
FROM top5 GROUP BY label
ORDER BY votes DESC, label LIMIT 1
""",
)
def q29_knn_label(spark, sf_dir):
    """Majority label among the 5 nearest neighbors of vec_id=0
    (deterministic tiebreaks: vec_id within the top-5 cut, then label)."""
    top5 = (
        _scored_vs_probe(spark, sf_dir)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
    )
    return (
        top5.groupBy("label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .orderBy(F.desc("votes"), F.asc("label"))
        .limit(1)
    )


PQ_BLOCKS = 8       # 64-dim vectors -> 8 subspaces of 8 dims
PQ_CODES = 16       # centroids per subspace (codes 0..15)


@register(
    "q184_pq_codebook_census",
    tier="T2",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
blocks AS (
  SELECT vec_id, b, v[b*8 + 1 : b*8 + 8] AS sub
  FROM e, unnest(generate_series(0, {PQ_BLOCKS - 1})) AS t(b)),
cent AS (SELECT b, vec_id AS code, sub AS cs
         FROM blocks WHERE vec_id < {PQ_CODES}),
scored AS (
  SELECT bl.vec_id, bl.b, c.code,
         list_reduce(list_transform(generate_series(1, 8),
             i -> (bl.sub[i] - c.cs[i]) * (bl.sub[i] - c.cs[i])),
             (x, y) -> x + y) AS d2
  FROM blocks bl JOIN cent c ON c.b = bl.b),
asg AS (
  SELECT b, code, d2 FROM (
    SELECT b, code, d2,
           row_number() OVER (PARTITION BY vec_id, b
                              ORDER BY d2, code) AS rn
    FROM scored) WHERE rn = 1)
SELECT CAST(b AS INT) AS block, CAST(code AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_assigned,
       round(min(d2), 4) AS min_d2, round(max(d2), 4) AS max_d2
FROM asg GROUP BY b, code
""",
)
def q184_pq_codebook_census(spark, sf_dir):
    """Product-quantization encoding census — the remaining ANN
    infrastructure tier next to LSH (q38/q120) and IVF (q39/q113):
    each 64-dim vector splits into {PQ_BLOCKS} 8-dim subvectors, each
    subvector is assigned its nearest codebook entry (codes = the
    first 16 vectors' corresponding slices — the deterministic
    stand-in for per-subspace k-means, q39's convention), and the
    query reports code popularity + quantization error spread per
    (block, code).  This is the layout statistic a PQ index build
    inspects for dead/overloaded codes before committing a codebook.

    Exactness discipline: squared L2 per subspace via an EXPLICIT
    left-to-right fold (``aggregate``/``list_reduce`` over zip
    products) in BOTH engines — never the engines' built-in distance
    functions, whose summation order (SIMD/pairwise) may differ by
    ULPs and flip near-tied argmins; argmin itself is the exact
    ``min(struct(d2, code))``, ties broken by code in both.

    Scale shape: the codebook ({PQ_BLOCKS} x {PQ_CODES} tiny rows)
    broadcasts; block expansion is in-row slicing; assignment is the
    map-side min-struct aggregate on (vec_id, block) — one shuffle of
    code-sized rows, never vector payloads; the census rollup is
    domain-bounded (blocks x codes rows)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    blocks = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_BLOCKS - 1}),"
                " b -> struct(b AS b, slice(v, b * 8 + 1, 8) AS sub))"
            )
        ).alias("bs"),
    ).select("vec_id", F.col("bs.b").alias("b"), F.col("bs.sub").alias("sub"))
    cent = (
        blocks.filter(F.col("vec_id") < PQ_CODES)
        .select(F.col("b").alias("cb"), F.col("vec_id").alias("code"),
                F.col("sub").alias("cs"))
    )
    d2 = F.expr(
        "aggregate(zip_with(sub, cs, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
    )
    scored = blocks.join(F.broadcast(cent), F.col("b") == F.col("cb")).select(
        "vec_id", "b", "code", d2.alias("d2")
    )
    asg = (
        scored.groupBy("vec_id", "b")
        .agg(F.min(F.struct("d2", "code")).alias("m"))
        .select("b", F.col("m.code").alias("code"), F.col("m.d2").alias("d2"))
    )
    return asg.groupBy("b", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.round(F.min("d2"), 4).alias("min_d2"),
        F.round(F.max("d2"), 4).alias("max_d2"),
    ).select(
        F.col("b").cast("int").alias("block"),
        F.col("code").cast("bigint").alias("code"),
        "n_assigned", "min_d2", "max_d2",
    )
