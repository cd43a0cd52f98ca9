"""Relational breadth tier 3 (q79-q81): bivariate statistical
aggregates, FILTER-style conditional aggregates, and exact vector
min/max reductions over the embedding column.

Reference capability note: each is one `map → shuffle(group) → reduce`
round of the reference model (MapReduceClient.h:55-65) with a richer
per-group combiner; Spark runs them as partial+final HashAggregate with
map-side combine, so the shuffle carries one row per (partition, group).

Oracle FP discipline (FIXTURES.md): corr is scale-free and rounded to
4 dp; covariance is rounded to 2 dp; conditional aggregates avoid `avg`
in favor of max/count (exact under reordering); vector stats use only
max/min (no summation), so float→double conversion is exact on both
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q79_corr_covar",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       round(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar
FROM lineitem
GROUP BY l_returnflag
""",
)
def q79_corr_covar(spark, sf_dir):
    """Bivariate moments per return flag: Pearson correlation and sample
    covariance between extended price and quantity. Both are
    decomposable into sum/sum-of-products partials, so the plan is a
    single partial+final aggregate — the same shuffle as a plain sum.
    Extended price is ~quantity × unit price in TPC-H-style generators,
    so corr is strongly positive and far from any rounding boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
    )


@register(
    "q80_conditional_agg",
    oracle="""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       bool_and(o_totalprice > 0) AS all_positive,
       round(max(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice END), 2) AS max_urgent_price
FROM orders
GROUP BY o_orderstatus
""",
)
def q80_conditional_agg(spark, sf_dir):
    """FILTER-clause style conditional aggregation per order status:
    a filtered count, boolean any/all reductions, and a conditional
    max. All four fold into one partial+final aggregate pass — the
    CASE/FILTER predicates are evaluated map-side, so the shuffle
    carries 4 scalars per group, not the rows. `max` (not `avg`) keeps
    the float result exact under partial-aggregation reordering."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(urgent).alias("any_urgent"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.round(F.max(F.when(urgent, F.col("o_totalprice"))), 2).alias(
            "max_urgent_price"
        ),
    )


@register(
    "q81_vector_minmax",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(CAST(max(list_aggregate(embedding, 'max')) AS DOUBLE), 4) AS max_dim,
       round(CAST(min(list_aggregate(embedding, 'min')) AS DOUBLE), 4) AS min_dim
FROM embeddings
GROUP BY label
""",
)
def q81_vector_minmax(spark, sf_dir):
    """Per-label envelope of the embedding space: the max/min component
    value across all vectors of each label. `array_max`/`array_min` run
    inside whole-stage codegen per row (no UDF, no explode — a 64-way
    explode would multiply shuffle input ×64), then an ordinary grouped
    max/min. Only comparisons, no summation: float→double widening is
    exact, so the 4-dp rounding is identical on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.array_max("embedding").cast("double").alias("_mx"),
            F.array_min("embedding").cast("double").alias("_mn"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.max("_mx"), 4).alias("max_dim"),
            F.round(F.min("_mn"), 4).alias("min_dim"),
        )
    )


@register(
    "q181_grouped_agg_iqr",
    tier="T2",
    oracle="""
WITH v AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(quantile_cont(vm, 0.75) - quantile_cont(vm, 0.25))
            AS BIGINT) AS iqr_micro
FROM v GROUP BY event_type
""",
)
def q181_grouped_agg_iqr(spark, sf_dir):
    """Interquartile range of event values per type via a GROUPED_AGG
    pandas UDF — promoting the custom-aggregate tier
    (``functions/grouped_agg.py``, previously tested-only) to an
    oracle-declared, hash-matched query; with q178 (cogroup) and q180
    (mapInArrow) this declares every Python kernel surface the engine
    ships.

    Exactness discipline: the UDF aggregates integer MICRO-UNITS, and
    linear quantile interpolation on int64 micro-values is EXACT double
    arithmetic (the interpolation fraction is a quarter — two binary
    digits — and the values sit far below 2^53), so
    ``floor(q75 - q25)`` is bit-identical between pandas' linear
    interpolation and DuckDB's ``quantile_cont`` (verified on both
    conventions' even/odd cases).  The count rides a separate JVM
    aggregate joined back on the group key — Spark refuses to mix
    GROUPED_AGG with JVM aggregates in one ``agg()``, and both sides
    hash-partition identically so the join adds no exchange.

    Scale note (from the module docstring): GROUPED_AGG has NO map-side
    partial aggregation — the whole group's values shuffle to one task,
    exactly the reference's reduce contract
    (``MapReduceClient.h:62-64``).  That is the declared trade: use it
    for aggregates Spark lacks, on bounded groups, and prefer JVM
    decomposable aggregates everywhere else (q43's percentile family is
    the JVM path for this same statistic)."""
    # the UDF comes from functions/grouped_agg.py, which deliberately
    # avoids `from __future__ import annotations` (stringified
    # annotations break GROUPED_AGG signature inference — this module
    # has that import, so defining the UDF here would fail)
    from multi_threaded_mapreduce_framework_spark.functions.grouped_agg import (
        make_iqr_udf,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").alias("vm"),
    )
    iqr = make_iqr_udf()
    stats = ev.groupBy("event_type").agg(iqr("vm").alias("iqr_d"))
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return counts.join(stats, "event_type").select(
        "event_type", "n", F.floor("iqr_d").cast("bigint").alias("iqr_micro")
    )
