"""TPC-H-shaped benchmark queries (q51-q54), adapted to the fixture
schema (TESTDATA.md; no o_shippriority / l_commitdate etc.).

These exercise the multi-join + agg plan shapes the single-table tiers
don't: star joins with selective dim filters, join-then-topk, and a
5-way join with a co-location predicate. All joins are declared without
hints except the fixed-size dims — Catalyst + AQE pick broadcast vs
shuffle by size, which is the correct call at every scale factor.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q51_tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum({_REVENUE}), 2) AS sum_disc_price,
       round(sum({_REVENUE} * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q51_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report), full expression set. One scan,
    partial+final hash aggregate on a 4-ish-row key space — shuffle
    volume is O(distinct keys x partitions) regardless of data size,
    the canonical 100 TB-safe aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(rev), 2).alias("sum_disc_price"),
            F.round(F.sum(rev * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q52_tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       round(sum({_REVENUE}), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderdate, l_orderkey
LIMIT 10
""",
)
def q52_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): selective dim filter -> 3-way join
    -> top-10 by revenue. The mktsegment filter shrinks customer ~5x
    BEFORE the join (pushed to the scan); top-k is
    TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q53_tpch_q5",
    oracle=f"""
SELECT n_name, round(sum({_REVENUE}), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def q53_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 5-way join where the
    supplier join carries the co-location predicate (customer and
    supplier in the same nation).

    Scale shape (VERDICT r02 item 3): Catalyst pushes ``r_name='ASIA'``
    into the region scan but cannot infer the implied
    ``c_nationkey IN (ASIA nations)`` through two join hops, so a naive
    plan shuffles all-region customer/orders/lineitem rows (5x the
    needed data at 100 TB).  Here the ASIA nation-key set (nation x
    filtered region, <=25 rows forever) broadcast-SEMI-joins customer
    and supplier BEFORE the fact chain, so every fact shuffle carries
    ASIA-only rows; nation broadcasts once more at the end for n_name.
    tests/test_plan_quality.py pins the two LeftSemi builds."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_keys = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    c = c.join(
        F.broadcast(asia_keys),
        c.c_nationkey == asia_keys.n_nationkey,
        "left_semi",
    )
    s = s.join(
        F.broadcast(asia_keys),
        s.s_nationkey == asia_keys.n_nationkey,
        "left_semi",
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


@register(
    "q54_tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, round(sum({_REVENUE}), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q54_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting, adapted): revenue from
    returned lineitems per customer, top 20. The returnflag filter is
    pushed to the lineitem scan (dictionary-encoded column — cheap skip
    at the parquet level)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
