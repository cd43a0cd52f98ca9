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
