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


def test_value_histogram_percentile_within_one_bin(spark, sf_dir):
    """q187's portable histogram estimate (bucket lower edge at the
    ceil(p*n) order statistic) must sit within ONE BIN WIDTH of the
    exact order statistic, per group and per percentile — the declared
    error bound of the fixed-depth (256) sketch.  The estimate itself
    is hash-gated against DuckDB (exact cross-engine parity); this test
    bounds its distance from TRUTH."""
    import math

    est = {
        r.l_returnflag: (r.p50_cents, r.p90_cents, r.p99_cents)
        for r in QUERIES["q187_value_histogram_percentile"]
        .builder(spark, sf_dir)
        .collect()
    }
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.expr(
                "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
            ).alias("vc"),
        )
        .collect()
    )
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r.vc)
    assert set(est) == set(by_flag)
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        width = (vals[-1] - vals[0]) // 256 + 1
        for p, got in zip((50, 90, 99), est[flag]):
            exact = vals[math.ceil(p * n / 100) - 1]  # the order statistic
            assert abs(got - exact) <= width, (flag, p, got, exact, width)
            # lower-edge estimate can never exceed the order statistic
            assert got <= exact, (flag, p, got, exact)
