"""Tier T1 extension — wider relational surface (q40-q50).

Grouping-set family, full-outer join, exact percentiles, stats
aggregates, pivot, subquery forms, array collection, ntile, and the
client-contract adapter itself as a declared (oracle-checked) query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q40_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q40_cube(spark, sf_dir):
    """CUBE over two grouping columns with grouping-id disambiguation
    (null-valued group cells vs real nulls). Spark plans this as a
    single Expand + one aggregation — no per-grouping-set rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty")


@register(
    "q41_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def q41_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (two disjoint single-column sets) via the
    SQL surface — one Expand, one shuffle, not two scans unioned."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q42_full_outer",
    oracle="""
SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
            WHEN o_orderkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS side,
       count(*) AS cnt
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY 1
""",
)
def q42_full_outer(spark, sf_dir):
    """FULL OUTER join null-pattern census — exercises both unmatched
    sides in one pass (SMJ; full-outer can't broadcast either side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("both")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(side.alias("side"))
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q43_percentiles",
    oracle="""
SELECT l_linestatus,
       round(quantile_cont(l_quantity, 0.5), 2) AS p50,
       round(quantile_cont(l_quantity, 0.9), 2) AS p90
FROM lineitem GROUP BY l_linestatus
""",
)
def q43_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). Exact percentile is a sort-based
    aggregate; the 100 TB path swaps in ``approx_percentile`` (KLL-style
    sketch, mergeable, single pass) at a declared error bound."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 2).alias("p90"),
    )


@register(
    "q44_stats_agg",
    oracle="""
SELECT o_orderpriority, count(*) AS cnt,
       round(avg(o_totalprice), 2) AS avg_price,
       round(stddev_samp(o_totalprice)/1000, 2) AS sd_k
FROM orders GROUP BY o_orderpriority
""",
)
def q44_stats_agg(spark, sf_dir):
    """Moment aggregates (avg, sample stddev). stddev is reported in
    thousands so residual float-summation-order noise stays far below
    the rounding quantum on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice") / 1000, 2).alias("sd_k"),
    )


@register(
    "q45_pivot",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
""",
)
def q45_pivot(spark, sf_dir):
    """Pivot on order status with an explicit value list (no extra
    distinct-values scan) — conditional-count cross-tab; empty cells
    are 0, not null, to match the FILTER form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "q46_exists_subquery",
    oracle="""
SELECT c_mktsegment, count(*) AS cnt
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
GROUP BY c_mktsegment
""",
)
def q46_exists_subquery(spark, sf_dir):
    """Correlated EXISTS with an extra predicate == left-semi join of a
    filtered build side (filter applied *before* the join, shrinking the
    shuffle/broadcast side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q47_scalar_subquery",
    oracle="""
SELECT o_orderstatus, count(*) AS cnt
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""",
)
def q47_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery: above-global-average filter. The
    1-row aggregate is broadcast into the filter — two passes over
    orders, no shuffle of the filtered side before aggregation."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q48_array_collect",
    oracle="""
SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
FROM events GROUP BY user_id
""",
)
def q48_array_collect(spark, sf_dir):
    """Set collection per group rendered as a sorted CSV string —
    collect_set is unordered on both engines, so the sort is what makes
    the result deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
    )


@register(
    "q49_ntile",
    oracle="""
SELECT bucket, count(*) AS cnt, round(min(o_totalprice), 2) AS min_price
FROM (SELECT o_totalprice,
             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
GROUP BY bucket
""",
)
def q49_ntile(spark, sf_dir):
    """Quartile bucketing via ntile over a global order (deterministic
    tiebreak on the key). A total-order window is single-partition by
    nature — kept as the exact-rank reference; q111_global_quantile_buckets
    (queries/relational4.py) is the declared 100 TB form: domain-bounded
    histogram -> cut points -> map-side bucket assignment, no global
    sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@register(
    "q50_mapreduce_wordcount",
    oracle="""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
""",
)
def q50_mapreduce_wordcount(spark, sf_dir):
    """q01 executed through the reference client-contract adapter
    (``run_mapreduce``: rdd.flatMap -> groupByKey -> per-group reduce,
    the reference's exact semantics) — declares the MapReduce API
    surface itself in the oracle-checked inventory. Deliberately the
    slow path (no partial aggregation, Python per row); q01 is the
    Catalyst form."""
    from multi_threaded_mapreduce_framework_spark.operators import run_mapreduce

    docs = load_table(spark, sf_dir, "documents").select("text")
    return run_mapreduce(
        docs,
        lambda row: [(w, 1) for w in row.text.split(" ")],
        lambda k, vs: [(k, sum(vs))],
        "word string, cnt long",
    )


@register(
    "q55_approx_count_distinct",
    oracle=None,  # rows-only: HLL estimates are engine-specific by design
)
def q55_approx_count_distinct(spark, sf_dir):
    """HyperLogLog++ distinct-count estimate per order status (rsd 1%).

    Declared rows-only: the estimate is a property of Spark's sketch,
    not portable SQL. The sketch is mergeable — the property that makes
    distinct-count a single partial-aggregate pass at 100 TB where exact
    count-distinct needs a full shuffle of the distinct keys.
    tests/test_approx.py asserts the estimate lands within 5% of exact.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_custs")
    )


@register(
    "q56_approx_percentile",
    oracle=None,  # rows-only: sketch quantiles are engine-specific
)
def q56_approx_percentile(spark, sf_dir):
    """Approximate p50/p99 of extended price per return flag
    (accuracy 10000 ~= 0.01% rank error). Mergeable-sketch counterpart
    of q43's exact percentile — the 100 TB path (exact percentile
    requires a per-group sort; the sketch is one streaming pass).
    tests/test_approx.py bounds its rank error against q43-style exact.
    Scalar p50/p99 columns (not an array) so the driver's rows-only
    canonicalizer can hash the frame."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.99], 10000)
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pcts, 1), 2).alias("p50"),
        F.round(F.element_at(pcts, 2), 2).alias("p99"),
    )


@register(
    "q57_date_arith",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       count(*) AS cnt,
       min(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00'))
         AS min_days_to_ref,
       max(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00'))
         AS max_days_to_ref,
       CAST(count(*) FILTER (WHERE month(o_orderdate + INTERVAL 45 DAY)
                             <> month(o_orderdate)) AS BIGINT) AS cross_month
FROM orders GROUP BY 1
""",
)
def q57_date_arith(spark, sf_dir):
    """Date arithmetic breadth: datediff to a reference date, interval
    addition with month-boundary classification, grouped per year."""
    o = load_table(spark, sf_dir, "orders")
    days_to_ref = F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
    crosses = (
        F.month(F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        != F.month("o_orderdate")
    ).cast("long")
    return o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(days_to_ref).alias("min_days_to_ref"),
        F.max(days_to_ref).alias("max_days_to_ref"),
        F.sum(crosses).alias("cross_month"),
    )


@register(
    "q58_string_funcs2",
    oracle="""
SELECT reverse(p_brand) AS brand_rev, count(*) AS cnt,
       min(strpos(p_type, ' ')) AS min_space_pos,
       max(length(lpad(p_name, 30, '_'))) AS padded_len
FROM part GROUP BY 1
""",
)
def q58_string_funcs2(spark, sf_dir):
    """Second string-function battery: reverse, substring position,
    left-pad — all JVM-side codegen expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(F.reverse("p_brand").alias("brand_rev")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.expr("locate(' ', p_type)")).alias("min_space_pos"),
        F.max(F.length(F.lpad("p_name", 30, "_"))).alias("padded_len"),
    )


@register(
    "q59_window_range_frame",
    oracle="""
SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW), 2) AS rolling_1h
FROM events
""",
)
def q59_window_range_frame(spark, sf_dir):
    """RANGE-framed window (trailing 1-hour sum per user) — value-based
    frames vs q18's row-based frames. The frame is over the event-time
    axis, so all rows sharing a timestamp join the same frame on both
    engines (deterministic without an id tiebreak)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("rolling_1h")
    )


@register(
    "q60_min_max_by",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS top_order,
       arg_min(o_orderkey, o_totalprice) AS bottom_order,
       round(max(o_totalprice), 2) AS top_price
FROM orders GROUP BY o_orderstatus
""",
)
def q60_min_max_by(spark, sf_dir):
    """Argmin/argmax aggregates (Spark max_by/min_by == DuckDB
    arg_max/arg_min): the single-pass alternative to a rank-window +
    filter when only the extreme row's attribute is needed — one shuffle
    of partial extremes instead of a full window sort. Prices are unique
    per status group in the fixture, so the arg row is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("max_by(o_orderkey, o_totalprice)").alias("top_order"),
        F.expr("min_by(o_orderkey, o_totalprice)").alias("bottom_order"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


HIST_DEPTH = 256  # fixed histogram depth: error bound = (hi-lo)/256 per group


@register(
    "q187_value_histogram_percentile",
    tier="T2",
    oracle=f"""
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
  FROM lineitem),
mm AS (
  SELECT flag, min(vc) AS lo, max(vc) AS hi, count(*) AS n,
         (max(vc) - min(vc)) // {HIST_DEPTH} + 1 AS w
  FROM v GROUP BY flag),
h AS (
  SELECT v.flag, (vc - lo) // w AS bucket, count(*) AS cnt
  FROM v JOIN mm ON v.flag = mm.flag GROUP BY v.flag, (vc - lo) // w),
c AS (
  SELECT h.flag, bucket, lo, w, n,
         sum(cnt) OVER (PARTITION BY h.flag ORDER BY bucket) AS cum
  FROM h JOIN mm ON h.flag = mm.flag)
SELECT flag AS l_returnflag,
       CAST(min(CASE WHEN cum >= (50*n + 99) // 100 THEN lo + bucket*w END)
            AS BIGINT) AS p50_cents,
       CAST(min(CASE WHEN cum >= (90*n + 99) // 100 THEN lo + bucket*w END)
            AS BIGINT) AS p90_cents,
       CAST(min(CASE WHEN cum >= (99*n + 99) // 100 THEN lo + bucket*w END)
            AS BIGINT) AS p99_cents
FROM c GROUP BY flag
""",
)
def q187_value_histogram_percentile(spark, sf_dir):
    """PORTABLE percentile sketch with cross-engine EXACT parity — the
    scale answer to rows-only q56 (r5 verdict item 5), the percentile
    analogue of what q177 did for HLL: a fixed-depth integer value
    histogram whose every step is deterministic integer arithmetic, so
    Spark and DuckDB produce bit-identical estimates and the driver
    hash gate applies to a SKETCH.

    Algorithm (identical SQL on both sides): prices in exact integer
    cents; per group take (lo, hi, n) and a fixed depth D=256 giving
    integer bin width w = (hi-lo) div D + 1 (so buckets lie in [0, D));
    count per bin; running count over the per-group bins; estimate of
    percentile p = LOWER EDGE of the first bin whose running count
    reaches ceil(p*n) (integer ceil: (p*100*n + 99) div 100).  Error is
    bounded by one bin width, (hi-lo)/256 per group — asserted against
    the exact order statistic in tests/test_approx.py.

    Scale shape (why this is the 100 TB percentile path): the bin-count
    layer is an ALGEBRAIC partial aggregate — daily histograms MERGE
    into monthly ones by adding counts (same law as q153's bitmap words
    and q144's partial aggs), one streaming pass, no per-group sort —
    and the only window runs over a DOMAIN-BOUNDED <=256 rows per
    group, never over the data.  Spark's own percentile_approx (q56)
    answers faster per-query but its sketch bytes are engine-private;
    this layer is the portable, re-aggregatable form you'd persist.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)").alias(
            "vc"
        ),
    )
    mm = li.groupBy("flag").agg(
        F.min("vc").alias("lo"),
        F.max("vc").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.expr(f"(max(vc) - min(vc)) div {HIST_DEPTH} + 1").alias("w"),
    )
    h = (
        li.join(F.broadcast(mm), "flag")
        .groupBy("flag", F.expr("(vc - lo) div w").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c = h.join(F.broadcast(mm), "flag").withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("flag").orderBy("bucket")
        ),
    )
    def _pick(p: int, name: str):
        return F.min(
            F.when(
                F.col("cum") >= F.expr(f"({p}*n + 99) div 100"),
                F.expr("lo + bucket*w"),
            )
        ).cast("bigint").alias(name)

    return c.groupBy(F.col("flag").alias("l_returnflag")).agg(
        _pick(50, "p50_cents"), _pick(90, "p90_cents"), _pick(99, "p99_cents")
    )
