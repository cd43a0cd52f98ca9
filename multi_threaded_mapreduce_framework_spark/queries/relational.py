"""Tier T1 — relational capability of the MapReduce model via Spark
built-ins (SURVEY.md §2.2/§2.3, q05-q22).

The reference has none of these as operators (its whole dataflow is one
fixed map->group->reduce pipeline, ``MapReduceFramework.cpp:118-248``);
each is expressible *within* its model (e.g. reduce-side join per Dean &
Ghemawat §4) and supplied here by the corresponding Catalyst-optimized
primitive. Scale notes are on each query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q05_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 30
""",
)
def q05_filter_project(spark, sf_dir):
    """Filter + 4-column projection; predicate and column pruning reach
    the parquet scan (verified via explain: PushedFilters/ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q06_join_agg",
    oracle="""
SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q06_join_agg(spark, sf_dir):
    """Fact-dim join + aggregate. No join hint: at bench scale Catalyst
    auto-broadcasts customer (< threshold); at 100 TB AQE picks SMJ and
    handles skew — hard-coding broadcast would break the scale-up."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "q07_join_chain",
    oracle="""
SELECT r_name, count(*) AS num_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def q07_join_chain(spark, sf_dir):
    """Chained dim joins. nation (25 rows) and region (5 rows) are
    fixed-size at ANY scale factor -> explicit broadcast is correct even
    at 100 TB (no shuffle of the customer side at all)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )


@register(
    "q08_left_join",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS num_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def q08_left_join(spark, sf_dir):
    """LEFT join preserving customers with zero orders (count of the
    nullable side). Equivalently an outer reduce-side join in the
    reference's model."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("num_orders"))
    )


@register(
    "q09_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def q09_semi_join(spark, sf_dir):
    """Left-semi join: customers having >=1 'F' order. The status filter
    runs before the join (pushed to the orders scan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return c.join(
        f_orders, c.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q10_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q10_anti_join(spark, sf_dir):
    """Left-anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q11_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def q11_topk(spark, sf_dir):
    """Top-10 orders by price (tiebreak o_orderkey). Physical plan is
    TakeOrderedAndProject: per-partition top-k then merge — no global
    sort, O(n) scan at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q12_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q12_distinct(spark, sf_dir):
    """Distinct pairs = group-by with identity reduce (partial distinct
    map-side, so the shuffle carries only unique pairs per partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "q13_count_distinct",
    oracle="""
SELECT o_orderstatus, count(DISTINCT o_custkey) AS num_cust
FROM orders GROUP BY o_orderstatus
""",
)
def q13_count_distinct(spark, sf_dir):
    """Exact count-distinct (two-phase: partial distinct then count).
    ``approx_count_distinct`` (HLL) is the documented 100 TB variant when
    exactness isn't required."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("num_cust")
    )


@register(
    "q14_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q14_union(spark, sf_dir):
    """Set union (distinct) of customer and supplier nation keys."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "q15_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q15_intersect(spark, sf_dir):
    """Nations having both customers and suppliers (set intersect)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "q16_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q16_except(spark, sf_dir):
    """Nations with customers but no suppliers (set difference)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "q17_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def q17_window_rank(spark, sf_dir):
    """Per-customer top-3 orders via row_number. The rank filter enables
    Spark's window-group-limit pushdown (top-3 kept per group before the
    full sort materializes)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q18_window_running",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 2) AS run_sum
FROM events
""",
)
def q18_window_running(spark, sf_dir):
    """Running per-user sum over event time (deterministic order via
    (ts, event_id))."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("run_sum"),
    )


@register(
    "q19_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def q19_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals with grouping-id disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@register(
    "q20_string_funcs",
    oracle="""
SELECT upper(p_brand) AS brand_u, substr(p_type, 1, 5) AS type5,
       CAST(floor(length(p_name) / 5) AS BIGINT) AS len_bucket,
       count(*) AS cnt
FROM part GROUP BY 1, 2, 3
""",
)
def q20_string_funcs(spark, sf_dir):
    """String-function classes (upper/substring/length bucketing)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.upper(F.col("p_brand")).alias("brand_u"),
            F.substring("p_type", 1, 5).alias("type5"),
            F.floor(F.length("p_name") / 5).cast("bigint").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q21_date_funcs",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY 1, 2
""",
)
def q21_date_funcs(spark, sf_dir):
    """Calendar bucketing (year/month extraction + aggregate)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "q22_json_extract",
    oracle="""
SELECT event_type,
       round(avg(CAST(props ->> '$.k' AS INTEGER)), 2) AS avg_k
FROM events GROUP BY event_type
""",
)
def q22_json_extract(spark, sf_dir):
    """JSON scalar extraction from events.props + per-type average."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.avg(F.get_json_object("props", "$.k").cast("int")), 2
        ).alias("avg_k")
    )
