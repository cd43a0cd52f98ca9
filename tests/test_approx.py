"""Accuracy bounds for the sketch-based approximate aggregates (declared
rows-only in the oracle contract — these tests are their correctness
gate instead)."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = all_queries()


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.approx_custs
        for r in QUERIES["q55_approx_count_distinct"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderstatus: r.exact
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, est in approx.items():
        assert abs(est - exact[status]) <= max(1, 0.05 * exact[status]), (
            status,
            est,
            exact[status],
        )


def test_approx_percentile_rank_error(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.p50, r.p99)
        for r in QUERIES["q56_approx_percentile"].builder(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.pcts
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("pcts"))
        .collect()
    }
    for flag, (a50, a99) in approx.items():
        e50, e99 = exact[flag]
        # value-space tolerance: 2% relative for p50, 5% for the tail
        assert abs(a50 - e50) <= 0.02 * e50, (flag, a50, e50)
        assert abs(a99 - e99) <= 0.05 * e99, (flag, a99, e99)
