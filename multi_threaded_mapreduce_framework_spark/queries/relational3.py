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
