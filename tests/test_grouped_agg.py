"""Grouped-agg pandas UDF (custom Arrow aggregate) parity: the Python
IQR aggregate must equal the JVM percentile computation exactly (both
use linear interpolation on the sorted group)."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.functions.grouped_agg import make_iqr_udf
from multi_threaded_mapreduce_framework_spark.sources import load_table


def test_iqr_udf_matches_jvm_percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    iqr = make_iqr_udf()
    got = {
        (r.l_linestatus, round(r.iqr, 6))
        for r in li.groupBy("l_linestatus")
        .agg(iqr("l_extendedprice").alias("iqr"))
        .collect()
    }
    want = {
        (r.l_linestatus, round(r.iqr, 6))
        for r in li.groupBy("l_linestatus")
        .agg(
            (
                F.expr("percentile(l_extendedprice, 0.75)")
                - F.expr("percentile(l_extendedprice, 0.25)")
            ).alias("iqr")
        )
        .collect()
    }
    assert got == want


def test_iqr_udf_joins_with_jvm_aggregates(spark, sf_dir):
    # grouped-agg pandas UDFs cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the pattern is two aggregates
    # joined on the group key (identical hash partitioning, one shuffle)
    li = load_table(spark, sf_dir, "lineitem")
    iqr = make_iqr_udf()
    py_agg = li.groupBy("l_returnflag").agg(iqr("l_quantity").alias("qty_iqr"))
    jvm_agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
    )
    rows = py_agg.join(jvm_agg, "l_returnflag").orderBy("l_returnflag").collect()
    assert len(rows) >= 2
    assert all(r.qty_iqr is not None and r.n > 0 for r in rows)
