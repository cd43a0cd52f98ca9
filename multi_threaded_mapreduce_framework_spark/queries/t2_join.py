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


@register(
    "q178_cogroup_conversion_lag",
    tier="T2",
    oracle="""
WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'),
lags AS (
  SELECT p.user_id, p.t - c.t AS lag_us
  FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.t >= c.t
),
per_u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_conv,
         list_sort(list(lag_us)) AS l
  FROM lags GROUP BY user_id
)
SELECT user_id, n_conv,
       CAST((l[CAST((n_conv + 1) // 2 AS INT)]
             + l[CAST(n_conv // 2 + 1 AS INT)]) // 2 AS BIGINT) AS med_lag_us
FROM per_u
""",
)
def q178_cogroup_conversion_lag(spark, sf_dir):
    """Per-user median click->purchase conversion lag via the COGROUP
    tier as a DECLARED, hash-matched query: each user's click stream
    and purchase stream arrive as TWO separate pandas frames
    (``groupBy().cogroup().applyInPandas`` — Spark's native form of
    the reference's reduce-side tag-union join,
    ``MapReduceFramework.cpp:224-239`` / Dean & Ghemawat §4), the
    kernel as-of-matches each purchase to its latest preceding click
    (vectorized ``searchsorted``) and emits the exact floor-median lag
    in integer microseconds.

    This promotes the cogroup operator surface (previously tested-only,
    SURVEY §2.3.1) to an oracle-declared query: DuckDB computes the
    identical statistic via its native ASOF JOIN + sorted-list median —
    two independent implementations, one exact integer answer (floor
    median = (lower + upper middle) div 2, no engine float anywhere).

    Scale shape: both event slices shuffle ONCE into a single
    FlatMapCoGroupsInPandas keyed on a 32-way USER BUCKET (pmod of
    user_id), not the raw user: the per-group Python invocation cost —
    the cogroup tier's dominant overhead, measured 3.5 s -> 1 s at
    sf0.1 when the fixture has ~15k users — is paid per bucket, while
    ALL per-user logic inside the kernel stays vectorized
    (``merge_asof(by=user_id)`` + rank-picked floor medians, no Python
    per user).  Bucketing the cogroup key never changes semantics
    (every user's rows still meet in exactly one group) and is the
    standard way to batch a per-key Python tier.  The JVM tag-union
    window (q70) remains the declared scale path for homogeneous
    schemas; cogroup is the right tier when the two sides' schemas or
    per-key logic cannot tag-union into one table."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t"),
        F.expr("pmod(user_id, 32)").alias("b"),
    )
    # the right side is RENAMED end to end: both sides derive from the
    # same scan, so identical attribute ids get de-duplicated by the
    # optimizer and the right frame silently loses those columns (the
    # self-cogroup trap operators/cogroup.py documents and regression-
    # tests) — fresh names make every right attribute its own
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.expr("unix_micros(ts)").alias("pt"),
        F.expr("pmod(user_id, 32)").alias("pb"),
    )

    def kernel(left, right):
        # left = this bucket's clicks, right = its purchases; all
        # per-user work is vectorized across the bucket
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"user_id": [], "n_conv": [], "med_lag_us": []}
        ).astype({"user_id": "int64", "n_conv": "int64", "med_lag_us": "int64"})
        if len(left) == 0 or len(right) == 0:
            return empty
        l = left.sort_values("t", kind="mergesort")[["user_id", "t"]]
        r = right.sort_values("pt", kind="mergesort")[["p_user", "pt"]]
        m = pd.merge_asof(
            r.rename(columns={"p_user": "user_id"}),
            l.rename(columns={"t": "ct"}),
            left_on="pt",
            right_on="ct",
            by="user_id",
            direction="backward",
        ).dropna(subset=["ct"])
        if len(m) == 0:
            return empty
        lag = (m["pt"] - m["ct"].astype("int64")).to_numpy()
        uid = m["user_id"].to_numpy()
        order = np.lexsort((lag, uid))
        uid, lag = uid[order], lag[order]
        # per-user rank + size without Python loops
        change = np.r_[True, uid[1:] != uid[:-1]]
        grp_start = np.flatnonzero(change)
        sizes = np.diff(np.r_[grp_start, len(uid)])
        rank = np.arange(len(uid)) - np.repeat(grp_start, sizes)
        n_per = np.repeat(sizes, sizes)
        lo = rank == (n_per - 1) // 2
        hi = rank == n_per // 2
        # floor median = (lower middle + upper middle) div 2
        med = (
            pd.DataFrame({"user_id": uid[lo], "v": lag[lo]})
            .merge(
                pd.DataFrame({"user_id": uid[hi], "v2": lag[hi]}),
                on="user_id",
            )
            .assign(med_lag_us=lambda d: (d["v"] + d["v2"]) // 2)
        )
        out = med.merge(
            pd.DataFrame({"user_id": uid[change], "n_conv": sizes}),
            on="user_id",
        )
        return out[["user_id", "n_conv", "med_lag_us"]].astype("int64")

    out = (
        clicks.groupBy("b")
        .cogroup(purchases.groupBy("pb"))
        .applyInPandas(kernel, "user_id bigint, n_conv bigint, med_lag_us bigint")
    )
    # Semantic no-op (n_conv >= 1 by construction) that REFERENCES the
    # kernel's output: without it, an output-less consumer (count())
    # lets ColumnPruning strip the cogroup node's output and,
    # transitively, the Python function's INPUT columns — the kernel
    # then receives key-only frames and crashes.  The filter pins the
    # output columns as required, so the inputs survive under any
    # consumer.  (Observed on Spark 4.1; collect() was never affected.)
    return out.filter(F.col("n_conv") >= 1)
