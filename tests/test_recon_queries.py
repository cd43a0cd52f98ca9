"""Tests for q146 (Merkle snapshot diff) and q147 (survivorship merge)."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.plans import executed_plan, num_exchanges
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = all_queries()


def _snapshots(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    v2 = (
        base.filter(F.col("o_orderkey") % 97 != 13)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 97 == 7, F.round(F.col("o_totalprice") + 10.0, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 97 == 21).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return base, v2


def test_q146_equals_exhaustive_full_join_diff(spark, sf_dir):
    df = QUERIES["q146_snapshot_diff_merkle"].builder(spark, sf_dir)
    v1, v2 = _snapshots(spark, sf_dir)
    a, b = v1.alias("a"), v2.alias("b")
    naive = (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
        .filter(
            F.col("b.o_orderkey").isNull()
            | F.col("a.o_orderkey").isNull()
            | (F.col("a.o_custkey") != F.col("b.o_custkey"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
            F.when(F.col("b.o_orderkey").isNull(), "deleted")
            .when(F.col("a.o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("t"),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, naive.collect()))
    # every change class is represented (the synthetic drift plants all three)
    kinds = {r["change_type"] for r in df.collect()}
    assert kinds == {"updated", "deleted", "inserted"}


def test_q146_zero_drift_means_zero_dirty_buckets(spark, sf_dir):
    """Identical snapshots must produce identical bucket digests — the
    drill-down would read nothing."""
    v1, _ = _snapshots(spark, sf_dir)
    h = F.xxhash64("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    dig = (
        v1.select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(4096)).alias("bucket"), h.alias("h")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.bit_xor("h").alias("hx"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hs"),
        )
    )
    a, b = dig.alias("a"), dig.alias("b")
    dirty = (
        a.join(b, "bucket", "full")
        .filter(
            (F.col("a.cnt") != F.col("b.cnt"))
            | (F.col("a.hx") != F.col("b.hx"))
            | (F.col("a.hs") != F.col("b.hs"))
        )
        .count()
    )
    assert dirty == 0


def test_q146_drilldown_is_bucket_pruned(spark, sf_dir):
    """The dirty-bucket set must be a small fraction of the 4096
    buckets, and the drill-down must be a broadcast semi-join on it."""
    df = QUERIES["q146_snapshot_diff_merkle"].builder(spark, sf_dir)
    plan = executed_plan(df)
    assert "LeftSemi" in plan and "Broadcast" in plan, plan
    n_changed_keys = df.count()
    # <=1 dirty bucket per changed key; far fewer than the domain
    assert n_changed_keys < 4096 * 0.25


def test_q147_survivor_rules_crafted(spark):
    rows = [
        # cluster A: 3 members -> survivor = longest (id 2), first id 1
        (1, "en", "s1", 100, "x y z a b c d e f g one"),
        (2, "en", "s2", 300, "x y z a b c d e f g two"),
        (3, "de", "s3", 200, "x y z a b c d e f g three"),
        # cluster B: singleton -> excluded
        (4, "en", "s4", 50, "totally different prefix tokens only here once ok fine"),
        # cluster C: tie on n_chars -> min doc_id wins
        (5, "fr", "s5", 70, "p q r s t u v w x y five"),
        (6, "fr", "s6", 70, "p q r s t u v w x y six"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, text string"
    )
    df.createOrReplaceTempView("_surv_docs")
    from pyspark.sql import Window

    docs = df.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.lower(F.trim("text")), " "), 1, 10))
        ).alias("k"),
    )
    w = Window.partitionBy("k")
    wr = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    out = (
        docs.select(
            "doc_id",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(w).alias("dup_cnt"),
            F.min("doc_id").over(w).alias("first_doc_id"),
            F.max("n_chars").over(w).alias("max_chars"),
        )
        .filter((F.col("rn") == 1) & (F.col("dup_cnt") > 1))
        .collect()
    )
    got = {r["doc_id"]: (r["dup_cnt"], r["first_doc_id"], r["max_chars"]) for r in out}
    assert got == {2: (3, 1, 300), 5: (2, 5, 70)}


def test_q147_single_shuffle(spark, sf_dir):
    df = QUERIES["q147_survivorship_merge"].builder(spark, sf_dir)
    assert num_exchanges(df) == 1  # one hash partition on the cluster key
