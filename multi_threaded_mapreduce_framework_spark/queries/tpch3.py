"""TPC-H-shaped tier 3 (q72-q78): the remaining classic plan shapes —
scan-only scalar aggregate (Q6), correlated-EXISTS semi join (Q4),
conditional-ratio aggregate (Q14), group-HAVING-then-join (Q18),
disjunctive multi-column join predicate (Q19), scalar-subquery HAVING
over a reused aggregate (Q11), and scalar-subquery + anti-join (Q22).

Adaptation rules as in ``tpch.py``/``tpch2.py``: the fixture schema
(TESTDATA.md) lacks ps_supplycost / l_commitdate / l_receiptdate /
l_shipmode / c_phone, so each query is re-shaped onto the columns that
exist while keeping the *plan shape* that makes the original a
benchmark: what shuffles, what broadcasts, where the predicate sits.
Reference capability note: each of these is expressible as one or two
`map → shuffle(group) → reduce` rounds of the reference's model
(MapReduceClient.h:55-65); here they are declarative Catalyst plans.

Scale notes (100 TB): Q6 is the pure-scan stress test — the predicate
must reach the parquet reader (PushedFilters) so row groups are skipped;
Q4's EXISTS is a left-semi join that shuffles both sides on orderkey at
scale (no broadcast — both are facts); Q14/Q19 broadcast `part`'s pruned
2-3 columns; Q18's HAVING runs map-side-partial first so only qualifying
order groups reach the join; Q11/Q22's scalar subqueries are 1-row
broadcasts (BroadcastNestedLoopJoin over a single row, not a shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

def _rev():
    # built lazily: F.col() needs an active SparkContext (pytest imports
    # this module during collection, before the session fixture exists)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q72_tpch_q6",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q72_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure filtered scan into a
    single scalar aggregate — no join, no group-by shuffle; the entire
    cost is the scan, so every predicate (date range, discount band,
    quantity cap) must appear in PushedFilters and only 4 columns in
    ReadSchema. The 1-row result needs one tiny final exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q73_tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q73_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking, adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = some line shipped more than
    60 days after the order date). The correlated EXISTS is a left-semi
    join on orderkey with the date comparison as a residual condition —
    at 100 TB both sides are facts, so this is a shuffled semi join on
    the join key; the dedup-by-key semantics of semi join mean no
    exists-count is materialized."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q74_tpch_q14",
    oracle="""
WITH t AS (
  SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
             AS promo_rev,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-07-01')
SELECT promo_rev, total_rev,
       round(100 * promo_rev / total_rev, 2) AS promo_pct
FROM t
""",
)
def q74_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-sum ratio over a
    fact ⋈ dim join. `part` is pruned to (p_partkey, p_type) and
    broadcast; the CASE folds into the same partial aggregate as the
    total, so one scan + one 1-row reduction. The percentage is computed
    from the *rounded* numerator/denominator on both sides so the ratio
    can't straddle a rounding boundary differently per engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type").startswith("PROMO"), _rev()).otherwise(F.lit(0.0))
    agg = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).agg(
        F.round(F.sum(promo), 2).alias("promo_rev"),
        F.round(F.sum(_rev()), 2).alias("total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        F.round(100 * F.col("promo_rev") / F.col("total_rev"), 2).alias("promo_pct"),
    )


@register(
    "q75_tpch_q18",
    oracle="""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 180)
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q75_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): aggregate-then-join. The
    HAVING filter runs right after the per-orderkey aggregate (partial
    map-side first), so only the ~10% qualifying orders reach the joins
    — at 100 TB that ordering is the difference between joining 600 B
    rows and joining 60 M. The orderkey aggregate's hash partitioning is
    reused by the orders join (same key, no re-shuffle). Quantities are
    integer-valued doubles, so the >180 cut is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 180)
        .select("l_orderkey", F.round("_q", 2).alias("sum_qty"))
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q76_tpch_q19",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_matches
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q76_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): a disjunction mixing columns of
    BOTH join sides, so it can only be applied after the join — the
    plan-shape point of Q19. Spark still derives the implied
    single-side prefilters (brand ∈ {..}, quantity ≤ 30) via constraint
    propagation; `part` is pruned to 3 columns and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    disj = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_matches"),
        )
    )


@register(
    "q77_tpch_q11",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice) AS v
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey < 5
  GROUP BY l_partkey)
SELECT l_partkey, round(v, 2) AS part_value
FROM pv
WHERE v > (SELECT sum(v) * 0.001 FROM pv)
""",
)
def q77_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock, adapted: part value = lineitem
    extended price shipped by suppliers of nations 0-4). The per-part
    aggregate is computed ONCE and reused for both the output rows and
    the global threshold (a 1-row aggregate joined back as a broadcast
    nested-loop of a single row — not a shuffle). The threshold compare
    uses the raw double on both sides (continuous data, so a boundary
    tie has probability ~0); only the output is rounded."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    pv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("v"))
    )
    thresh = pv.agg((F.sum("v") * 0.001).alias("_t"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("v") > F.col("_t"))
        .select("l_partkey", F.round("v", 2).alias("part_value"))
    )


@register(
    "q78_tpch_q22",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_nationkey
""",
)
def q78_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity, adapted: "inactive" =
    above-average-balance customer with no finished ('F') order;
    nationkey stands in for the missing phone country code). Two
    classic sub-plans: a scalar subquery (1-row broadcast) for the
    average, and a NOT EXISTS as a left-anti join against the filtered
    orders — the anti side is filtered *before* the join so only 'F'
    orderkeys shuffle."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_ab"))
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(f_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
