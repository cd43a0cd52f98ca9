"""Salted aggregation: exact parity with plain groupBy for algebraic
aggregates, including on a deliberately skewed key distribution."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.operators.skew import SALT_COL, salted_agg
from multi_threaded_mapreduce_framework_spark.plans import num_exchanges


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows on key 'hot', a handful elsewhere — the shape that melts
    # a single reducer at scale
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("cold"), F.col("id") % 5).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {"s": "sum(v)", "c": "count(*)", "mn": "min(v)", "mx": "max(v)"},
        n_salts=8,
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salt_column_not_leaked(spark, skewed):
    out = salted_agg(skewed, ["k"], {"s": "sum(v)"})
    assert SALT_COL not in out.columns


def test_two_shuffles_by_design(spark, skewed):
    # the price of spreading: one extra (much smaller) exchange
    out = salted_agg(skewed, ["k"], {"s": "sum(v)"})
    assert num_exchanges(out) == 2


def test_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"a": "avg(v)"})


def test_salt_spreads_identical_rows(spark):
    """Byte-identical duplicate rows (the most common hot-key shape)
    must land on several salts: the partition-id mix guarantees spread
    wherever the duplicates span more than one input partition."""
    from multi_threaded_mapreduce_framework_spark.operators.skew import salt_column

    dup = (
        spark.range(4_000)
        .select(F.lit("hot").alias("k"), F.lit(1).alias("v"))
        .repartition(4)
    )
    n = dup.select(salt_column(dup, 16).alias("s")).distinct().count()
    assert n > 1, "identical rows all mapped to one salt"


def _write_skewed_corpus(spark, path: str, n_hot: int = 120, n_bg: int = 100):
    """documents.parquet with one hot LSH bucket: n_hot byte-identical
    docs (same shingles -> same key in every band) plus n_bg mutually
    dissimilar background docs."""
    hot_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, hot_text) for i in range(n_hot)]
    rows += [
        (
            n_hot + i,
            " ".join(f"bg{i}tok{j}" for j in range(12)),
        )
        for i in range(n_bg)
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


def test_q128_hot_shingle_aqe_skew_split(spark, tmp_path):
    """Contamination-tier skew hardening (VERDICT r04 item 7): q128's
    distributed LEFT SEMI on the shingle key is the query where BOTH
    sides shuffle, so a Zipf-hot shingle is its natural skew exposure.
    Fixture: every doc is one shared hot 5-gram plus one unique token
    (two shingles/doc), so ~half the holdout side's shuffle bytes pile
    onto a single shingle key.  Assert the exact per-doc leak answer
    AND that AQE's OptimizeSkewedJoin actually splits the skewed
    partition (skew=true) with thresholds scaled to test size.

    The split only fires because q128 MATERIALIZES the train index
    before the probe join: OptimizeSkewedJoin requires both join
    children to be plain sorted shuffle stages, so with the distinct
    feeding the join directly (exchange reuse) the join is ineligible
    and no fixture shape can make it split — measured, and documented
    in q128's docstring."""
    import hashlib

    from multi_threaded_mapreduce_framework_spark.queries import all_queries

    n_docs = 10_000
    hot = " ".join(f"hotterm{j:02d}withlongpayloadbytes" for j in range(5))
    rows = [(i, f"{hot} u{i}x") for i in range(n_docs)]
    spark.createDataFrame(rows, "doc_id bigint, text string").repartition(
        16
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    # replicate q61's md5 bucket split: bucket >= 80 -> holdout
    bucket = lambda i: int(  # noqa: E731
        hashlib.md5(str(i).encode()).hexdigest()[:14], 16
    ) % 100
    holdout = {i for i in range(n_docs) if bucket(i) >= 80}
    assert holdout and len(holdout) < n_docs  # both splits populated

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # force the shuffle join path: broadcast would bypass skew
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = all_queries()["q128_train_holdout_leakage"].builder(spark, str(tmp_path))
        got = {(r.doc_id, r.n_shingles, r.n_leaked, r.leak_centi) for r in df.collect()}
        # 6 tokens -> 2 distinct shingles/doc; only the hot 5-gram is
        # shared with train (the u{i}x-suffixed shingle is unique/doc)
        want = {(i, 2, 1, 50) for i in holdout}
        assert got == want
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q35_hot_bucket_aqe_skew_split(spark, tmp_path):
    """Dedup-tier skew hardening: q35's band self-join on a corpus with
    one hot bucket still returns the exact answer, and with AQE skew
    thresholds scaled down to test size the runtime actually splits the
    skewed partition (OptimizeSkewedJoin marks the join skew=true)."""
    from multi_threaded_mapreduce_framework_spark.queries import all_queries

    q35 = all_queries()["q35_minhash_lsh"]
    _write_skewed_corpus(spark, str(tmp_path))
    n_hot = 120

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # scale AQE's skew detection down to test-sized shuffles (and
        # keep partition coalescing from papering over the imbalance)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # broadcast would bypass the shuffle join entirely at this size
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q35.builder(spark, str(tmp_path))
        rows = df.collect()
        # exact answer under skew: every hot pair at jaccard 1.0, no
        # cross/background pairs
        assert len(rows) == n_hot * (n_hot - 1) // 2
        assert all(r.jaccard == 1.0 and r.d1 < r.d2 < n_hot for r in rows)
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
