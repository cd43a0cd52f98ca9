"""TPC-H-shaped tier 2 (q64-q66): cross-nation trade, supplier-count
rollup with a null-safe NOT IN exclusion, and best-supplier-per-part.

Same adaptation rules as ``tpch.py`` (fixture schema per TESTDATA.md —
no ps_supplycost / l_commitdate, so Q2/Q7/Q16 are re-shaped onto the
columns that exist while keeping each query's *plan shape*: the
double-dimension join of Q7, the anti-join + count-distinct rollup of
Q16, the per-group-argmax of Q2). Reference capability note: every one
of these is one `map → shuffle → reduce` round in the reference model
(MapReduceClient.h:55-65); here they're multi-join Catalyst plans with
broadcast dims and AQE-sized shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q64_tpch_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum({_REVENUE}), 2) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q64_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping, adapted): revenue between two named
    nations in both directions, by ship year. The plan's signature is
    the DOUBLE dimension join — nation joined twice under different
    roles (supplier's vs customer's). Both nation sides broadcast;
    the nation-name filter reaches each broadcast build side before the
    probe, so the fact rows that survive are only those touching the
    two nations."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


@register(
    "q65_tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q65_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship, adapted): distinct
    supplier count per (brand, type, size), excluding suppliers with a
    negative balance via an anti-join (the NOT IN subquery; s_suppkey is
    non-null so anti-join and null-aware NOT IN coincide). The exclusion
    list is tiny -> broadcast anti-join, no extra shuffle; the
    count-distinct expands to a two-phase aggregate on (group, suppkey)
    which is the scalable form at 100 TB (no per-group hash sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q66_tpch_q2",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM part
  JOIN ps ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size < 10)
SELECT p_partkey, p_name, s_suppkey AS best_suppkey,
       s_name AS best_supp_name, round(s_acctbal, 2) AS best_acctbal
FROM ranked WHERE rn = 1
ORDER BY best_acctbal DESC, p_partkey
LIMIT 20
""",
)
def q66_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier, adapted to max-acctbal since the
    fixture has no ps_supplycost): for each small part, the
    highest-balance supplier that has actually shipped it, top 20
    overall. The part-supplier relation is derived by DISTINCT over
    lineitem (aggregate on the join key -> reused by the subsequent
    join's partitioning); the per-part argmax is a rank-1 window with a
    deterministic suppkey tiebreak instead of Q2's correlated subquery
    — same semantics, one shuffle fewer."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        p.join(ps, p.p_partkey == ps.l_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_suppkey").alias("best_suppkey"),
            F.col("s_name").alias("best_supp_name"),
            F.round("s_acctbal", 2).alias("best_acctbal"),
        )
        .orderBy(F.desc("best_acctbal"), F.asc("p_partkey"))
        .limit(20)
    )
