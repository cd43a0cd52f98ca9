"""Tier T0 — direct MapReduce-surface parity queries (SURVEY.md §2.3).

These are the queries the reference engine's computational model runs
natively: flatMap -> group-by-key -> per-group reduce. q01/q02 are the
reference's own canonical workload (character/word counting,
``Sample Client/SampleClient.cpp:32-66``) expressed as DataFrame plans:
scan -> explode -> hash-aggregate, with Spark's map-side partial
aggregation replacing the reference's combiner-less full shuffle
(``MapReduceFramework.cpp:160-218``) — the single biggest asymptotic
upgrade at 100 TB (shuffle volume ~= #distinct keys per partition, not
#intermediate pairs).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q01_wordcount",
    tier="T0",
    oracle="""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
""",
)
def q01_wordcount(spark, sf_dir):
    """Word count over documents.text — the flagship query.

    Reference analog: SampleClient's map/emit2/shuffle/reduce pipeline
    with words as K2. Plan: parquet scan (text column only) -> generate
    (explode) -> partial HashAggregate -> shuffle on word -> final
    HashAggregate. At scale the partial aggregate bounds shuffle volume
    by distinct-words-per-partition.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q02_charcount",
    tier="T0",
    oracle="""
SELECT ch, count(*) AS cnt
FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents) t
GROUP BY ch
""",
)
def q02_charcount(spark, sf_dir):
    """Per-character counts — the reference sample client's exact query
    (``SampleClient.cpp:34-65``: map emits (char,1), reduce sums)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", "")).alias("ch"))
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q03_grouped_sum",
    tier="T0",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def q03_grouped_sum(spark, sf_dir):
    """TPC-H Q1-lite: grouped sums over lineitem (pure map->group->reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "q04_user_event_stats",
    tier="T0",
    oracle="""
SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id
""",
)
def q04_user_event_stats(spark, sf_dir):
    """Per-user event count + value sum over the events stream table."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
