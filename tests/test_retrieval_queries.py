"""Law-pinning tests for the retrieval tier (q209-q210): the
bucket-restriction guarantee of bitext mining, and q210's
WindowGroupLimit rank-pushdown plan claim plus its recall identities."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_dedup import _bucket_col
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = {n: q.builder for n, q in all_queries().items()}


def _buckets(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = e.select("vec_id", _bucket_col().alias("b")).collect()
    return {r.vec_id: r.b for r in rows}


def test_q209_pairs_share_a_bucket_and_respect_the_sample(spark, sf_dir):
    """Every mined pair must (a) come from the declared src sample
    (en, doc_id % 10 = 0) and a de target, and (b) share an LSH bucket
    — the restriction that makes mining sub-quadratic is a semantic
    guarantee, not an optimization."""
    out = QUERIES["q209_bitext_mining"](spark, sf_dir).collect()
    assert out, "fixture must mine at least one candidate pair"
    bk = _buckets(spark, sf_dir)
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    for r in out:
        assert r.src_id % 10 == 0 and langs[r.src_id] == "en"
        assert langs[r.tgt_id] == "de"
        assert bk[r.src_id] == bk[r.tgt_id]
    # argmax is per-src: no src appears twice
    srcs = [r.src_id for r in out]
    assert len(srcs) == len(set(srcs))


def test_q210_rank_limit_plans_as_window_group_limit(spark, sf_dir):
    """The 100 TB claim: row_number <= k must plan as WindowGroupLimit
    (partial per-task top-k BEFORE the exchange), so the per-probe
    window never materializes corpus-sized partitions."""
    df = QUERIES["q210_ann_recall_census"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_q210_recall_identities(spark, sf_dir):
    """n_hit <= min(n_exact, n_lsh); n_exact == k whenever the corpus
    has k non-probe rows; recall_milli is the declared integer law."""
    rows = QUERIES["q210_ann_recall_census"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_exact == 10  # smallest fixture has 50 embeddings
        assert 0 <= r.n_hit <= min(r.n_exact, r.n_lsh)
        assert r.n_lsh <= 10
        assert r.recall_milli == 1000 * r.n_hit // r.n_exact
