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
