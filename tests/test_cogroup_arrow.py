"""Parity tests for the cogroup and mapInArrow operator tiers
(operators/cogroup.py): three implementations of the as-of semantics
must agree row-for-row, and the Arrow-native token kernel must match
the JVM expression exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.operators.cogroup import (
    arrow_token_stats,
    cogroup_asof,
)
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = all_queries()


def test_cogroup_asof_matches_q70_window_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    got = {
        (r.event_id, r.user_id, r.gap_s)
        for r in cogroup_asof(purchases, clicks)
        .select(
            "event_id",
            "user_id",
            F.round(F.col("gap_us") / F.lit(1000000.0), 1).alias("gap_s"),
        )
        .collect()
    }
    want = {
        (r.event_id, r.user_id, r.gap_s)
        for r in QUERIES["q70_asof_join"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_cogroup_plan_is_flatmap_cogroups(spark, sf_dir):
    """The physical operator must be FlatMapCoGroupsInPandas with both
    sides exchanged on the key — the Spark-native reduce-side-join
    contract (reference tag-union trick, SURVEY.md §2.1 R10)."""
    from multi_threaded_mapreduce_framework_spark.plans import executed_plan

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    plan = executed_plan(cogroup_asof(p, c))
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_arrow_token_stats_matches_jvm_expression(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_id, r.n_tokens) for r in arrow_token_stats(docs).collect()
    }
    want = {
        (r.doc_id, r.n_tokens)
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        ).collect()
    }
    assert got == want


def test_arrow_token_stats_empty_input(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    assert arrow_token_stats(docs).count() == 0


def test_q178_survives_output_less_consumers(spark):
    """Regression for the cogroup input-pruning trap: q178 must return
    the same row count under count() (output-less consumer — the shape
    that made Catalyst prune the un-renamed right side's columns out of
    the Python function's input) and collect()."""
    from multi_threaded_mapreduce_framework_spark.queries import all_queries

    df = all_queries()["q178_cogroup_conversion_lag"].builder(
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() == len(df.collect())
