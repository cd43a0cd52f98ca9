"""Physical-layout queries: results that depend on a declared storage
layout (bucketing) being in place.

The reference pre-shards its input vector once and every worker thread
owns its shard for the whole job (``MapReduceFramework.cpp`` job setup);
the lake-scale equivalent is a BUCKETED table: the shuffle for a join or
aggregation on the bucket key is paid once at write time, and every
later query on that key reads pre-shuffled data with no exchange.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table
from multi_threaded_mapreduce_framework_spark.sources.sinks import (
    write_bucketed_table,
)


@register(
    "q112_bucketed_join",
    tier="T1",
    oracle="""
SELECT c_mktsegment,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total_price
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def q112_bucketed_join(spark, sf_dir):
    """Join over a BUCKETED layout (VERDICT r02 item 6): customer and
    orders are first persisted bucketed+sorted on the join key (8
    buckets, external location — the one-time shuffle), then the join
    reads the co-located layout back. With broadcast disabled,
    ``tests/test_plan_quality.py::test_q112_bucketed_join_no_exchange``
    pins that the join itself needs NO exchange and NO sort — at 100 TB
    this is the difference between re-shuffling two fact tables on
    every query and paying the layout cost once at ingest.

    The result (revenue per market segment) is layout-independent, so
    the DuckDB oracle checks the same values off the raw parquet.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), "mtmrf_layout", tag)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust_t, ord_t = f"mtmrf_cust_b_{tag}", f"mtmrf_ord_b_{tag}"
    write_bucketed_table(
        c, cust_t, ["c_custkey"], 8,
        sort_cols=["c_custkey"], location=os.path.join(base, "customer"),
    )
    write_bucketed_table(
        o, ord_t, ["o_custkey"], 8,
        sort_cols=["o_custkey"], location=os.path.join(base, "orders"),
    )
    cb, ob = spark.table(cust_t), spark.table(ord_t)
    return (
        cb.join(ob, cb.c_custkey == ob.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
