"""Temporal join operators (q70-q71): as-of join and interval join.

Neither exists as a Spark built-in; both are training-pipeline /
time-series staples the reference's generic shuffle could express as one
map→group→reduce round (MapReduceClient.h:55-65 — map emits the join
key, reduce scans the group). Here they are re-expressed as
SINGLE-SHUFFLE compositions of DataFrame primitives:

- as-of join = union both sides + one per-key window pass (the
  sort-merge as-of strategy native engines like DuckDB/Pandas use,
  expressed declaratively so Catalyst plans the sort);
- interval join = bucketed equi-join (explode the probe side into
  window-width buckets) + residual range filter, the standard
  Flink-style interval-join decomposition that avoids the O(n·m)
  inequality cross-join.

Both oracles are native DuckDB forms (ASOF JOIN / inequality LEFT
JOIN), so the decompositions are verified against an independent
implementation, not against themselves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table


@register(
    "q70_asof_join",
    tier="T2",
    oracle="""
SELECT p.event_id, p.user_id,
       round((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0, 1) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
""",
)
def q70_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the same user's most recent
    STRICTLY-prior click; output the gap in seconds (null = no prior
    click, preserved like ASOF LEFT JOIN).

    Engine form: tag-union both sides, one window pass per user ordered
    by (ts, is_click) taking ``last(click_ts, ignorenulls)`` over the
    preceding-through-current frame. The is_click tiebreak orders a
    same-timestamp click AFTER the purchase so strict ``>`` holds.
    Scale: ONE shuffle on user_id and one local sort — no join at all,
    so no skewed-key pair blowup when a user has many clicks (the
    naive join+argmax shuffles |purchases|x|clicks| pairs per user);
    state per key is one scalar. The gap is computed in exact int64
    micros before one float division, so both engines round the same
    IEEE double. Oracle: DuckDB's native ASOF JOIN — an independent
    merge-join implementation of the same semantics."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias("c_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_c_us", F.last("c_us", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 0)
        .select(
            "event_id",
            "user_id",
            F.round(
                (F.unix_micros("ts") - F.col("last_c_us")) / F.lit(1000000.0), 1
            ).alias("gap_s"),
        )
    )


_WIN_MIN = 10  # interval width in minutes == bucket width (exact cover by 2 buckets)
_WIN_US = _WIN_MIN * 60 * 1_000_000


@register(
    "q71_interval_join",
    tier="T2",
    oracle=f"""
SELECT e.event_id, e.user_id, count(c.ts) AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL {_WIN_MIN} MINUTE
 AND c.ts < e.ts
GROUP BY e.event_id, e.user_id
""",
)
def q71_interval_join(spark, sf_dir):
    """Interval join: for each error event, the count of clicks by the
    same user in the preceding 10 minutes (zero-count errors kept).

    Engine form: clicks explode into their own 10-minute bucket and the
    next one (each click meets each error at most once, since an error
    lives in exactly one bucket); the join is then a pure EQUI-join on
    (user_id, bucket) with the exact [ts-10min, ts) range as a residual
    predicate, left-outer to preserve errors with no clicks. Scale:
    Catalyst plans a hash/sort-merge join instead of the O(errors x
    clicks)-per-user nested loop a raw inequality join forces; shuffle
    volume is 2x the click rows, and widening skew is handled by AQE
    like any equi-join. Bucket arithmetic is exact int64 micros."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("e_us"),
        (F.unix_micros("ts") / F.lit(_WIN_US)).cast("long").alias("bucket"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.unix_micros("ts").alias("c_us"),
            (F.unix_micros("ts") / F.lit(_WIN_US)).cast("long").alias("c_bucket"),
        )
        .withColumn("bucket", F.explode(F.array("c_bucket", F.col("c_bucket") + 1)))
        .drop("c_bucket")
    )
    joined = err.join(
        clicks,
        (err.user_id == clicks.c_user)
        & (err.bucket == clicks.bucket)
        & (clicks.c_us >= err.e_us - F.lit(_WIN_US))
        & (clicks.c_us < err.e_us),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_us").alias("n_clicks_10m")
    )


@register(
    "q124_asof_pandas",
    tier="T2",
    oracle="""
SELECT p.event_id, p.user_id,
       round((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0, 1) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
""",
)
def q124_asof_pandas(spark, sf_dir):
    """q70's as-of join implemented on the OTHER custom-operator tier:
    Arrow-grouped ``applyInPandas`` running ``pd.merge_asof`` per user
    group (the pattern for operator semantics DataFrame primitives
    can't express — here they can, which is exactly why both forms are
    declared: q70 is the single-window JVM plan, this is the
    grouped-pandas plan, and the driver checks both against DuckDB's
    native ASOF JOIN).

    Scale notes: ONE vectorized ``pd.merge_asof(..., by='user_id')``
    call per PARTITION (``repartition(user_id)`` + ``mapInPandas``) —
    never one Python call per user, which costs interpreter overhead
    per key and was measured 6x slower at sf0.1. Partition state is the
    partition's rows (the merge needs a full per-partition time sort);
    the raw microsecond gap comes back from pandas and the 1-dp
    rounding happens IN SPARK so the rounding rule is identical to
    q70's."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )

    def asof(batches):
        import pandas as pd

        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        p = pdf[pdf.event_type == "purchase"][
            ["event_id", "user_id", "ts"]
        ].sort_values("ts", kind="mergesort")
        c = pdf[pdf.event_type == "click"][["user_id", "ts"]].sort_values(
            "ts", kind="mergesort"
        ).rename(columns={"ts": "c_ts"})
        if len(p) == 0:
            return
        if len(c) == 0:
            out = p.copy()
            out["gap_us"] = float("nan")
            yield out[["event_id", "user_id", "gap_us"]]
            return
        m = pd.merge_asof(
            p, c, left_on="ts", right_on="c_ts", by="user_id",
            allow_exact_matches=False, direction="backward",
        )
        m["gap_us"] = (m["ts"] - m["c_ts"]).dt.total_seconds() * 1e6
        yield m[["event_id", "user_id", "gap_us"]]

    out = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .repartition("user_id")
        .mapInPandas(asof, schema="event_id bigint, user_id bigint, gap_us double")
    )
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("gap_us") / F.lit(1000000.0), 1).alias("gap_s"),
    )


@register(
    "q176_interval_sweep_concurrency",
    tier="T2",
    oracle="""
WITH iv AS (
  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT)
           + 60 + ((event_id % 900) * 61) % 900 AS e
  FROM events
),
pts AS (
  SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT e, CAST(-1 AS BIGINT) FROM iv
),
run AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM pts
),
m AS (SELECT max(conc) AS mx FROM run)
SELECT CAST(m.mx AS BIGINT) AS max_concurrent,
       CAST(min(r.t) AS BIGINT) AS at_s,
       (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals
FROM run r, m WHERE r.conc = m.mx GROUP BY m.mx
""",
)
def q176_interval_sweep_concurrency(spark, sf_dir):
    """Peak concurrency of activity intervals (each event opens an
    interval of 60-1020 s — q158's overflow-safe per-event duration
    law) by SWEEP LINE: +1 at each start, -1 at each end (half-open
    [s, e): ends sort before coincident starts), running-sum the
    ordered deltas, report the maximum and the earliest instant
    attaining it — the "peak simultaneous sessions" statistic capacity
    planning runs.

    Scale shape: the running sum over (t, delta) is a TOTAL-ORDER
    prefix scan — as one window it is a single-partition corpus pass.
    Here it is the q158/q139 two-level decomposition: points bucket by
    HOUR, each bucket prefix-sums internally (window partitioned by
    bucket), per-bucket TOTALS (one row per hour — bounded by the time
    range, not by events) take the tiny cumulative window, and
    in-bucket + prior-bucket offsets recombine.  The peak + earliest
    argmax is then one partial-agg pass (max, then conditional min) —
    no sort of the corpus anywhere.  Integer-second arithmetic end to
    end (FIXTURES.md discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_seconds(date_trunc('second', ts))").alias("s"),
        F.expr(
            "unix_seconds(date_trunc('second', ts))"
            " + 60 + ((event_id % 900) * 61) % 900"
        ).alias("e"),
    )
    pts = ev.select(F.col("s").alias("t"), F.lit(1).cast("bigint").alias("delta")).union(
        ev.select(F.col("e").alias("t"), F.lit(-1).cast("bigint").alias("delta"))
    )
    pts = pts.withColumn("bkt", F.expr("t div 3600"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pts.withColumn("run_in", F.sum("delta").over(w_in))
    btot = pts.groupBy("bkt").agg(F.sum("delta").alias("bsum"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prev = btot.select(
        "bkt", F.coalesce(F.sum("bsum").over(w_b), F.lit(0)).alias("pre_b")
    )
    run = local.join(F.broadcast(prev), "bkt").withColumn(
        "conc", F.col("run_in") + F.col("pre_b")
    )
    n_iv = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_intervals"))
    mx = run.agg(F.max("conc").alias("mx"))
    return (
        run.join(F.broadcast(mx))
        .filter(F.col("conc") == F.col("mx"))
        .agg(
            F.max("mx").cast("bigint").alias("max_concurrent"),
            F.min("t").cast("bigint").alias("at_s"),
        )
        .join(F.broadcast(n_iv))
        .select("max_concurrent", "at_s", "n_intervals")
    )
