"""Breadth tier 4 (q82-q85, q107, q109-q110): time-series gap-fill
(dense hourly grid with zero backfill), window distribution functions
(percent_rank / cume_dist), blocked fuzzy matching by edit distance,
document chunking, retention cohorts, rolling distinct counts, and
unpivot (melt).

Reference capability note: gap-fill is `map → group → reduce` with a
generated dimension (the reference model can only emit from existing
rows — emit2 per input pair, MapReduceClient.h:57-59 — so a dense grid
needs the map side to *synthesize* keys; Spark's `sequence`+`explode`
does exactly that declaratively). Distribution windows and blocked
similarity are single-shuffle grouped computations.

Scale notes (100 TB): the gap-fill grid is generated per group from two
scalars (min/max hour), so grid size is independent of input row count
— the dangerous alternative, a cross join against a global calendar
table, is avoided. The fuzzy match is only feasible blocked: the
(brand, size) equi-key bounds each block to ~tens of rows, so the
quadratic edit-distance work is per-block-tiny and fully parallel;
levenshtein runs JVM-side inside codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import (
    load_table,
    spread_small_scan,
)


def first_week_events(spark, sf_dir):
    """Events before the first-week cutoff — the shared input window of
    the dense-series queries (q82 zero-fill, q167 interpolation)."""
    return load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(FIRST_WEEK_CUTOFF).cast("timestamp")
    )


def user_hour_grid(ev):
    """Dense per-user hourly grid between each user's first and last
    event hour, synthesized from two aggregate scalars via
    ``sequence()`` + ``explode`` — grid cost scales with users x hours,
    not events, and no global calendar cross join exists.  Shared by
    q82 and q167 so a grid-semantics change cannot silently diverge."""
    return (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("_h0"),
            F.date_trunc("hour", F.max("ts")).alias("_h1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket_ts"),
        )
    )



FIRST_WEEK_CUTOFF = "2024-01-08"


@register(
    "q82_gap_fill",
    tier="T2",
    oracle=f"""
WITH ev AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '{FIRST_WEEK_CUTOFF}'),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         count(*) AS n_events, round(sum(value), 2) AS value_sum
  FROM ev GROUP BY 1, 2),
spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM ev GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket_ts
  FROM spans)
SELECT g.user_id, g.bucket_ts,
       coalesce(h.n_events, 0) AS n_events,
       coalesce(h.value_sum, 0.0) AS value_sum
FROM grid g LEFT JOIN hourly h
  ON g.user_id = h.user_id AND g.bucket_ts = h.bucket_ts
""",
)
def q82_gap_fill(spark, sf_dir):
    """Dense hourly activity series per user over the first week: every
    hour between a user's first and last event appears, with zeros for
    silent hours. The grid is synthesized per user from two aggregate
    scalars via `sequence()` + `explode` — grid cost scales with
    users × hours, not with event count, and no global calendar cross
    join exists in the plan. Both the hourly aggregate and the grid
    hash-partition by user_id, and Spark's `sequence` and DuckDB's
    `generate_series` are both inclusive of the endpoint."""
    ev = first_week_events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )
    grid = user_hour_grid(ev)
    return (
        grid.join(hourly, ["user_id", "bucket_ts"], "left")
        .select(
            "user_id",
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        )
    )


@register(
    "q83_window_distribution",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       round(percent_rank() OVER w, 6) AS price_pct_rank,
       round(cume_dist() OVER w, 6) AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
)
def q83_window_distribution(spark, sf_dir):
    """Distribution-function windows: each order's price percentile
    position within its status partition. percent_rank and cume_dist
    are rank-based — `(rank-1)/(n-1)` and `rank/n` — so both engines
    perform the identical IEEE division and the 6-dp rounding is
    bit-stable. One shuffle (partition by status), one sort within
    partitions, both functions share the same window frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@register(
    "q85_chunk_documents",
    tier="T2",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS start
  FROM t)
SELECT doc_id,
       CAST(start // 24 AS INT) AS chunk_idx,
       array_to_string(toks[start + 1 : least(start + 32, len(toks))], ' ')
           AS chunk_text,
       CAST(least(start + 32, len(toks)) - start AS INT) AS n_tokens
FROM c
""",
)
def q85_chunk_documents(spark, sf_dir):
    """Context-window chunking of the corpus: 32-token chunks with
    stride 24 (8-token overlap) per document — the canonical LLM
    training-data preprocessing step. Pure column algebra
    (`split` → `sequence` → `explode` → `slice` → `array_join`, see
    functions/chunking.py): no shuffle at all — chunking is embarrassingly
    parallel per document, and the explode fan-out (~n/stride ×) happens
    inside the scan stage's codegen. A UDTF variant with identical
    semantics (the tokenizer-aware escape hatch) ships alongside in
    `functions.chunking.ChunkText`."""
    from multi_threaded_mapreduce_framework_spark.functions.chunking import chunk_expr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_expr(docs, "text", size=32, stride=24).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    )


@register(
    "q84_edit_distance_pairs",
    tier="T2",
    oracle="""
SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 6
""",
)
def q84_edit_distance_pairs(spark, sf_dir):
    """Blocked fuzzy name matching: part pairs in the same
    (brand, size) block whose names are within edit distance 6.
    The equi-join on the blocking key turns an O(n²) all-pairs edit
    distance into per-block quadratic work over ~tens of rows — the
    standard blocking trick for fuzzy dedup at scale (same pattern as
    q35's LSH bands, with a semantic key instead of a sketch).
    Levenshtein is an exact integer, identical on both engines."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("_name_a"),
        "p_brand",
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("_name_b"),
        F.col("p_brand").alias("_brand_b"),
        F.col("p_size").alias("_size_b"),
    )
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("_brand_b"))
            & (F.col("p_size") == F.col("_size_b"))
            & (F.col("partkey_a") < F.col("partkey_b")),
        )
        .withColumn("edit_dist", F.levenshtein("_name_a", "_name_b"))
        .filter(F.col("edit_dist") <= 6)
        .select("partkey_a", "partkey_b", "edit_dist")
    )


@register(
    "q107_retention_cohorts",
    tier="T2",
    oracle="""
WITH cohorts AS (
  SELECT user_id,
         min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(date_trunc('week', e.ts) AS DATE) AS act_week
  FROM events e)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS BIGINT)
         AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM cohorts c JOIN activity a ON a.user_id = c.user_id
WHERE a.act_week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
""",
)
def q107_retention_cohorts(spark, sf_dir):
    """Retention triangle: users are cohorted by the ISO week of their
    first signup event; each later activity week counts them as active
    at ``week_offset = (activity_week - cohort_week) / 7``. Classic
    product analytics, and a distinct plan class: a self-derived
    dimension (the cohort table comes from the fact table itself)
    joined back to the fact.

    Plan shape: the cohort aggregate and the distinct-activity set both
    partial-aggregate on user_id before one co-partitioned join (same
    key, so AQE plans it shuffle-reusing); the final (cohort, offset)
    rollup is a second small shuffle. ``count(DISTINCT user)`` is exact
    here because the join key is already user_id — the expand trick
    Spark uses stays within the existing partitioning. Week math is
    integer day arithmetic (ISO Monday truncation in both engines), so
    the oracle comparison is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.min(F.date_trunc("week", "ts"))).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("act_week")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("act_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "q109_rolling_wau",
    tier="T2",
    oracle="""
WITH presence AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
contrib AS (
  SELECT p.user_id, p.day + CAST(o.off AS INTEGER) AS obs_day
  FROM presence p CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o)
SELECT obs_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM contrib GROUP BY obs_day
""",
)
def q109_rolling_wau(spark, sf_dir):
    """Rolling 7-day active users per day (trailing WAU): each
    (user, presence-day) pair contributes that user to the seven
    observation days it covers, then a distinct count per observation
    day — the standard rewrite for the query SQL windows cannot express
    (COUNT(DISTINCT) over a moving frame is unsupported in every
    engine's window clause).

    Scale shape: presence is deduplicated FIRST (one row per user-day,
    partial agg), so the x7 explode multiplies the already-collapsed
    set, not the raw event stream; the distinct count shuffles on
    observation day. Window length w multiplies shuffle volume by w —
    for long windows (MAU) the same skeleton carries (user, day)
    presence into a sketch (HLL per day, q55's operator) instead of
    exact distinct.
    """
    ev = load_table(spark, sf_dir, "events")
    presence = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        presence.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        )
        .select("user_id", F.expr("date_add(day, off)").alias("obs_day"))
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "q110_unpivot",
    tier="T1",
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_discount), 2) AS sum_disc
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, measure, value
FROM agg UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
""",
)
def q110_unpivot(spark, sf_dir):
    """UNPIVOT (melt): the inverse of q45's pivot — three wide measure
    columns become (measure, value) rows, the long format every
    metrics-warehouse export wants. Run on the 3-row-per-flag aggregate
    (unpivot is a zero-shuffle row-local expansion, like a typed
    explode), so the only shuffle is the upstream sum. Measures are
    rounded BEFORE the unpivot on both sides, keeping the row-value
    multiset comparison exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "q111_global_quantile_buckets",
    tier="T1",
    oracle="""
WITH q AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS ip, o_totalprice
           FROM orders),
h AS (SELECT ip, count(*) AS c FROM q GROUP BY ip),
t AS (SELECT sum(c) AS n FROM h),
cum AS (SELECT ip, sum(c) OVER (ORDER BY ip) AS cum FROM h),
cuts AS (SELECT
    min(CASE WHEN cum >= (n*1 + 3) // 4 THEN ip END) AS c1,
    min(CASE WHEN cum >= (n*2 + 3) // 4 THEN ip END) AS c2,
    min(CASE WHEN cum >= (n*3 + 3) // 4 THEN ip END) AS c3
  FROM cum, t)
SELECT CAST(1 + CAST(ip > c1 AS INT) + CAST(ip > c2 AS INT)
              + CAST(ip > c3 AS INT) AS BIGINT) AS bucket,
       count(*) AS cnt,
       round(min(o_totalprice), 2) AS min_price
FROM q, cuts
GROUP BY bucket
""",
)
def q111_global_quantile_buckets(spark, sf_dir):
    """q49's 100 TB form (VERDICT r02 item 4): global quartile bucketing
    WITHOUT a global sort.  q49's ntile(4) is a single-partition window
    over the whole table — the one plan that cannot scale.  Here:

    1. quantize price to integer dollars (``ip``) — the distinct-value
       DOMAIN is bounded by the price range, not the row count, so the
       histogram stays ~600k rows at any data scale;
    2. map-side partial-agg histogram ``(ip, count)`` — the only
       data-sized pass, a shuffle of domain-bounded size;
    3. cumulative ranks over the tiny histogram (a single-partition
       window over a domain-bounded input is fine — this is the trick);
    4. derive the three quartile cut points as one 1-row aggregate
       (``min ip where cum >= ceil(k*n/4)``, integer arithmetic — no FP
       boundary ambiguity vs the oracle);
    5. broadcast the 1-row cuts and assign buckets map-side; re-agg.

    Buckets split on integer-dollar boundaries (ties stay together), so
    counts are near-equal rather than exactly n/4 — deterministic and
    engine-independent, unlike sketch-based approx cut points."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor("o_totalprice").cast("long").alias("ip"), "o_totalprice"
    )
    hist = o.groupBy("ip").agg(F.count(F.lit(1)).alias("c"))
    n_total = hist.agg(F.sum("c").alias("n"))
    w = Window.orderBy("ip").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("ip", F.sum("c").over(w).alias("cum"))
    cuts = (
        cum.join(F.broadcast(n_total))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"(n*{k} + 3) div 4"), F.col("ip")
                    )
                ).alias(f"c{k}")
                for k in (1, 2, 3)
            ]
        )
    )
    bucket = (
        F.lit(1)
        + (F.col("ip") > F.col("c1")).cast("int")
        + (F.col("ip") > F.col("c2")).cast("int")
        + (F.col("ip") > F.col("c3")).cast("int")
    ).cast("bigint")
    return (
        o.join(F.broadcast(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@register(
    "q121_map_functions",
    tier="T1",
    oracle="""
SELECT user_id,
       CAST(coalesce(count(*) FILTER (WHERE event_type = 'click'), 0)
            AS BIGINT) AS clicks,
       CAST(coalesce(count(*) FILTER (WHERE event_type = 'purchase'), 0)
            AS BIGINT) AS purchases,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       count(*) AS total
FROM events GROUP BY user_id
""",
)
def q121_map_functions(spark, sf_dir):
    """MAP-typed column surface: each user's per-type event counts are
    assembled into a ``map<string,bigint>`` profile column
    (``map_from_entries`` over collected (type, count) structs — the
    shape a feature store hands to serving), then consumed with map
    lookups (``element_at``), ``size``, and a higher-order fold over
    ``map_values``. The map stays INTERNAL (scalar output columns), so
    the driver's canonicalizer sees plain scalars; lookups are
    insertion-order-independent, so the nondeterministic collect_list
    order cannot leak into results. The oracle computes the same
    numbers relationally."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    prof = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("profile")
    )
    return prof.select(
        "user_id",
        F.coalesce(F.element_at("profile", F.lit("click")), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("profile", F.lit("purchase")), F.lit(0)).alias(
            "purchases"
        ),
        F.size("profile").cast("bigint").alias("n_types"),
        F.aggregate(
            F.map_values("profile"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("total"),
    )


@register(
    "q122_lateral_topk",
    tier="T1",
    oracle="""
SELECT s.c_mktsegment, t.c_custkey, t.acctbal
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer c
         WHERE c.c_mktsegment = s.c_mktsegment
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
""",
)
def q122_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery through the SQL front-end: top-2
    customers by account balance PER market segment, written as the
    lateral join a SQL user would write (per-group ORDER BY ... LIMIT
    inside the correlated subquery). Catalyst decorrelates it into the
    same windowed plan as q17's rank-filter form — declaring that the
    engine's SQL surface accepts the idiom, not just the DataFrame
    rewrite. DuckDB runs the identical SQL."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q122_customer_v"
    )
    return spark.sql(
        """
SELECT s.c_mktsegment, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
FROM (SELECT DISTINCT c_mktsegment FROM q122_customer_v) s,
LATERAL (SELECT c_custkey, c_acctbal FROM q122_customer_v c
         WHERE c.c_mktsegment = s.c_mktsegment
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""
    )


@register(
    "q123_scd2_cdc",
    tier="T1",
    oracle="""
WITH changed AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-07-01'),
v1 AS (
  SELECT c_custkey, CAST(1 AS BIGINT) AS version,
         round(c_acctbal, 2) AS acctbal,
         CAST(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_current
  FROM customer LEFT JOIN changed ON c_custkey = o_custkey),
v2 AS (
  SELECT c_custkey, CAST(2 AS BIGINT) AS version,
         round(c_acctbal + 100.0, 2) AS acctbal,
         CAST(1 AS BIGINT) AS is_current
  FROM customer JOIN changed ON c_custkey = o_custkey)
SELECT * FROM v1 UNION ALL SELECT * FROM v2
""",
)
def q123_scd2_cdc(spark, sf_dir):
    """SCD2 / CDC merge EMULATION without a table format (the
    MERGE-INTO pattern on plain parquet): customers whose orders mark
    them changed (a stand-in CDC feed) get a new versioned row; their
    old row is closed (is_current=0); untouched customers keep their
    current v1 row. One semi-side derivation + left-join flag + union —
    the anti-join/union shape you run when Delta/Iceberg MERGE isn't
    available, and the history layout (key, version, is_current) every
    SCD2 dimension query expects. All joins are on the dimension key,
    so at 100 TB the CDC feed (small) broadcasts and the dimension
    never shuffles."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    changed = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    v1 = c.join(
        F.broadcast(changed), c.c_custkey == changed.o_custkey, "left"
    ).select(
        "c_custkey",
        F.lit(1).cast("bigint").alias("version"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.when(F.col("o_custkey").isNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_current"),
    )
    v2 = c.join(
        F.broadcast(changed), c.c_custkey == changed.o_custkey, "left_semi"
    ).select(
        "c_custkey",
        F.lit(2).cast("bigint").alias("version"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    return v1.unionAll(v2)


@register(
    "q182_udtf_chunk_census",
    tier="T2",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, lang, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS start
  FROM t),
ch AS (
  SELECT lang,
         CAST(least(start + 32, len(toks)) - start AS INT) AS n_tokens
  FROM c)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN n_tokens = 32 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_chunks
FROM ch GROUP BY lang
""",
)
def q182_udtf_chunk_census(spark, sf_dir):
    """Chunk census per language with the chunking performed by the
    registered SQL UDTF (``functions/chunking.py::ChunkText``, Arrow-
    optimized form, LATERAL join) — promoting the user-defined TABLE
    function tier to an oracle-declared query.  The UDTF is the engine's
    typed ``emit2`` analog (one input row -> many typed output rows,
    ``MapReduceClient.h:57-59``), and with q178 (cogroup), q180
    (mapInArrow), and q181 (GROUPED_AGG) every custom-operator surface
    the engine ships is now exercised by a declared, hash-matched query.

    q85 remains the declared scale path for chunking itself (pure
    column algebra, zero Python); this query's role is the UDTF
    surface: identical chunk law (32/24, q85's oracle family), consumed
    through ``LATERAL chunk_text(...)`` in SQL and rolled up per lang
    so the output is bounded while every chunk row still flows through
    the UDTF.

    Scale shape: the UDTF fan-out happens inside the scan stage
    (Arrow-batched rows in, generated rows out, no shuffle below it);
    the only exchange is the lang-domain partial agg."""
    from multi_threaded_mapreduce_framework_spark.functions.chunking import (
        register_chunk_udtf,
    )

    name = "mtmrf_chunk_text_q182"
    register_chunk_udtf(spark, name=name, use_arrow=True)
    # spread the 1-split doc scan so the per-row UDTF eval parallelizes
    # (q171's r11 note; no-op on multi-split production input) — the
    # UDTF surface and chunk law are unchanged
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    docs.createOrReplaceTempView("mtmrf_q182_docs")
    return spark.sql(
        f"""
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(c.n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN c.n_tokens = 32 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_full_chunks
        FROM mtmrf_q182_docs d, LATERAL {name}(d.text, 32, 24) c
        GROUP BY d.lang
        """
    )
