"""Invariant tests for the q153-q160 exact-structure queries: each one
cross-checks the scale-shaped plan against the naive Spark formulation
it replaces (an in-process oracle, independent of the DuckDB gate), or
pins a structural property the value-hash alone can't express."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = all_queries()


def test_q153_bitmap_equals_count_distinct(spark, sf_dir):
    """The merged bitmap census must equal Spark's own exact
    countDistinct (word packing / OR-merge loses nothing)."""
    got = {
        (r.event_type, r.distinct_users)
        for r in QUERIES["q153_bitmap_distinct"].builder(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.d)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("d"))
        .collect()
    }
    assert got == want


def test_q154_ordinal_is_permutation(spark, sf_dir):
    """Ordinals must be exactly 1..N with no gaps or dupes (offset +
    local rank composes into a bijection), and respect the declared
    total order."""
    rows = QUERIES["q154_global_ordinal"].builder(spark, sf_dir).collect()
    ords = sorted(r.ordinal for r in rows)
    assert ords == list(range(1, len(rows) + 1))
    docs = {
        r.doc_id: (r.n_chars, r.doc_id)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_ord = sorted(rows, key=lambda r: r.ordinal)
    keys = [docs[r.doc_id] for r in by_ord]
    assert keys == sorted(keys)


def test_q155_matches_bruteforce_levenshtein(spark):
    """The deletion-neighborhood candidates + verify must return
    EXACTLY the all-pairs levenshtein==1 set (FastSS recall proof on
    real data).  Pinned to the smallest fixture regardless of the
    session sf_dir: the oracle here is a driver-side O(n^2) Python pair
    scan, bounded only by the fixture size."""
    from tests.conftest import SF_SMOKE

    sf_dir = SF_SMOKE
    got = {
        (r.name1, r.name2)
        for r in QUERIES["q155_deletion_neighbors"].builder(spark, sf_dir).collect()
    }
    names = [
        r.c_name
        for r in load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_name")
        .collect()
    ]
    assert len(names) < 5_000, "brute-force oracle unbounded: fixture too large"

    def lev1(a: str, b: str) -> bool:
        if abs(len(a) - len(b)) > 1 or a == b:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if len(a) < len(b) else (b, a)
        i = 0
        while i < len(s) and s[i] == t[i]:
            i += 1
        return s[i:] == t[i + 1 :]

    want = {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :] if lev1(*sorted((a, b)))
    }
    want = {tuple(sorted(p)) for p in want}
    assert got == want


def test_q156_equals_full_window_topk(spark, sf_dir):
    """Partial top-k pushdown must be lossless vs the full-shuffle
    window formulation, including price ties broken by o_orderkey."""
    got = {
        (r.o_orderpriority, r.o_orderkey, r.o_totalprice, r.rk)
        for r in QUERIES["q156_topk_pushdown"].builder(spark, sf_dir).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.o_orderpriority, r.o_orderkey, r.o_totalprice, r.rk)
        for r in load_table(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rk").cast("int").alias("rk"),
        )
        .collect()
    }
    assert got == want


def test_q158_census_partitions_all_events(spark, sf_dir):
    """on_time + late must account for every event (the bucket-boundary
    recombination drops or double-counts nothing), and the earliest
    arrival is never late (null watermark => on-time)."""
    rows = QUERIES["q158_watermark_replay"].builder(spark, sf_dir).collect()
    total = sum(r.on_time_cnt + r.late_cnt for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    assert all(r.on_time_cnt >= 1 or r.late_cnt == 0 for r in rows)


def test_q158_matches_single_window_prefix_max(spark, sf_dir):
    """The two-level (bucket) prefix max must equal the single-window
    formulation it decomposes — per event type and count."""
    got = {
        (r.event_type, r.on_time_cnt, r.late_cnt)
        for r in QUERIES["q158_watermark_replay"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("unix_seconds(date_trunc('second', ts))").alias("ts_s"),
        # same overflow-safe reduced form as the query (61 = 2654435761 % 900)
        F.expr("((event_id % 900) * 61) % 900").alias("d"),
    )
    w = Window.orderBy(F.col("ts_s") + F.col("d"), "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = (
        ev.withColumn("wm", F.max("ts_s").over(w) - 600)
        .withColumn(
            "late",
            F.when(F.col("wm").isNull(), F.lit(False)).otherwise(
                F.col("ts_s") < F.col("wm")
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum((~F.col("late")).cast("int")).cast("bigint").alias("on_time_cnt"),
            F.sum(F.col("late").cast("int")).cast("bigint").alias("late_cnt"),
        )
    )
    want = {(r.event_type, r.on_time_cnt, r.late_cnt) for r in naive.collect()}
    assert got == want


def test_q159_matches_sorted_scan_median(spark, sf_dir):
    """Histogram weighted median == the definitionally-sorted running
    weight crossing, computed driver-side from the (tiny) histogram."""
    got = {
        (r.l_returnflag, r.wmed_qty)
        for r in QUERIES["q159_weighted_median"].builder(spark, sf_dir).collect()
    }
    hist = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w"))
        .collect()
    )
    from collections import defaultdict

    per_flag = defaultdict(list)
    for r in hist:
        per_flag[r.l_returnflag].append((r.l_quantity, r.w))
    want = set()
    for flag, vals in per_flag.items():
        vals.sort()
        total = sum(w for _, w in vals)
        cum = 0
        for q, w in vals:
            cum += w
            if 2 * cum >= total:
                want.add((flag, int(q)))
                break
    assert got == want


def test_q160_jaccard_matches_set_math(spark, sf_dir):
    """Mask-census algebra == literal Python set intersection over the
    per-language vocabularies."""
    got = {
        (r.l1, r.l2): (r.n1, r.n2, r.inter)
        for r in QUERIES["q160_lang_overlap"].builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    from collections import defaultdict

    vocab = defaultdict(set)
    for r in docs:
        vocab[r.lang].update(t for t in r.text.split(" ") if t)
    langs = sorted(vocab)
    want = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter > 0:
                want[(a, b)] = (len(vocab[a]), len(vocab[b]), inter)
    assert got == want


def test_q162_matches_raw_predicate_sets(spark, sf_dir):
    """Bitmap AND/AND-NOT algebra == literal per-user predicate sets."""
    got = QUERIES["q162_bitmap_set_algebra"].builder(spark, sf_dir).collect()[0].n_users
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, set()).add(r.event_type)
    want = sum(
        1
        for types in by_user.values()
        if "purchase" in types and "error" in types and "signup" not in types
    )
    assert got == want


def test_q163_matches_grouping_sets_count_distinct(spark, sf_dir):
    """Word-layer rollups == Spark's own GROUPING SETS countDistinct."""
    got = {
        (r.event_type, r.day, r.distinct_users)
        for r in QUERIES["q163_bitmap_distinct_rollup"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").cast("string").alias("day"), "user_id"
    )
    ev.createOrReplaceTempView("ev_gs")
    want = {
        (r.event_type, r.day, r.distinct_users)
        for r in spark.sql(
            "SELECT event_type, day, CAST(count(DISTINCT user_id) AS BIGINT)"
            " AS distinct_users FROM ev_gs"
            " GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))"
        ).collect()
    }
    assert got == want


def test_q164_matches_raw_day_sets(spark, sf_dir):
    """Word-AND retention == literal per-day user-set intersections."""
    got = {
        (r.day, r.retained)
        for r in QUERIES["q164_bitmap_retention"].builder(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").cast("string").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from datetime import date, timedelta

    days = defaultdict(set)
    for r in rows:
        days[r.day].add(r.user_id)
    want = set()
    for d, users in days.items():
        nxt = (date.fromisoformat(d) + timedelta(days=1)).isoformat()
        inter = len(users & days.get(nxt, set()))
        if inter > 0:
            want.add((d, inter))
    assert got == want


def test_q156_partial_fold_correct_across_many_partitions(spark, sf_dir):
    """The fixture scan may be a single partition (one parquet row
    group), which would make the in-scan partial top-k trivially
    global — so force 13 partitions and re-run the same fold + final
    window, asserting losslessness when every partition really does
    contribute its own candidate set."""
    import pandas as pd

    K = 3
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .repartition(13)
    )

    def partial_topk(batches):
        cand = None
        for pdf in batches:
            cur = pd.concat([cand, pdf]) if cand is not None else pdf
            cur = cur.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
            )
            cand = cur.groupby("o_orderpriority", sort=False).head(K)
        if cand is not None:
            yield cand

    survivors = orders.mapInPandas(partial_topk, orders.schema)
    # survivors must be bounded by partitions x groups x K, not table size
    assert survivors.count() <= 13 * 5 * K
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    got = {
        (r.o_orderpriority, r.o_orderkey)
        for r in survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .collect()
    }
    want = {
        (r.o_orderpriority, r.o_orderkey)
        for r in load_table(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .collect()
    }
    assert got == want


def test_q165_matches_raw_window_sets(spark, sf_dir):
    """Grid-windowed word OR == literal 7-day user-set unions."""
    got = {
        (r.day, r.wau)
        for r in QUERIES["q165_bitmap_rolling_wau"].builder(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())  # NULL is not a user
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    days = defaultdict(set)
    for r in rows:
        days[r.d].add(r.user_id)
    want = set()
    for d in days:
        users = set()
        for back in range(7):
            users |= days.get(d - timedelta(days=back), set())
        want.add((d.isoformat(), len(users)))
    assert got == want


def test_q166_exact_gap_merges_session(spark):
    """The boundary the review caught: two events separated by EXACTLY
    the 30-minute gap must land in ONE session (Spark merges while
    ts <= window end = last + gap); the oracle's strict > encodes the
    same rule.  A >= oracle would split this pair and fail the gate on
    any fixture with second-granularity timestamps."""
    from datetime import datetime

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0)),
            (1, datetime(2024, 1, 1, 10, 30, 0)),
            (1, datetime(2024, 1, 1, 11, 0, 1)),  # 30:01 gap -> new session
        ],
        "user_id long, ts timestamp",
    )
    sessions = df.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = sorted(r.n for r in sessions.collect())
    assert got == [1, 2], got  # exact gap merged, 30:01 split


def test_q170_matches_bruteforce_dominance(spark, sf_dir):
    """Histogram-decomposed skyline == literal O(n^2) dominance scan."""
    got = {
        (r.doc_id, r.v, r.n)
        for r in QUERIES["q170_pareto_skyline"].builder(spark, sf_dir).collect()
    }
    rows = [
        (r.doc_id, len(set(r.text.split(" "))), len(r.text.split(" ")))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    want = {
        (i, v, n)
        for (i, v, n) in rows
        if not any(
            bv >= v and bn <= n and (bv > v or bn < n) for (_, bv, bn) in rows
        )
    }
    assert got == want


def test_q172_matches_independent_raster_oracle(spark, sf_dir):
    """The declared image pipeline's rollup must equal an oracle
    computed HERE with plain numpy from first principles (the ramp law
    + the NN grid mapping) — no engine code on the oracle side, so a
    bug in encode/parse/resize cannot cancel itself out.  Also pins
    that max_w/max_h came from the re-encoded raster (12 x 10)."""
    import numpy as np

    got = {
        (r.lang, r.format): (r.n_images, r.avg_intensity, r.max_w, r.max_h)
        for r in QUERIES["q172_multimodal_image"].builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()

    def nn_mean(d: int) -> float:
        w, h = 8 + d % 8, 6 + d % 5
        px = ((np.arange(w * h * 3) + d) % 256).astype(np.uint8).reshape(h, w, 3)
        rows_ = np.minimum(((np.arange(10) + 0.5) * h / 10).astype(int), h - 1)
        cols_ = np.minimum(((np.arange(12) + 0.5) * w / 12).astype(int), w - 1)
        # the engine rounds each per-image mean to 2dp before averaging
        return round(float(px[rows_][:, cols_].mean()), 2)

    acc: dict[tuple[str, str], list[float]] = {}
    for r in docs:
        key = (r.lang, "png" if r.doc_id % 2 else "ppm")
        acc.setdefault(key, []).append(nn_mean(int(r.doc_id)))
    want = {
        key: (len(v), round(sum(v) / len(v), 2), 12, 10) for key, v in acc.items()
    }
    assert got == want


def test_q173_matches_independent_frame_oracle(spark, sf_dir):
    """The declared video pipeline's rollup must equal an oracle
    computed HERE from first principles (the per-frame ramp law + the
    500 ms sampling grid) with plain numpy — no engine code on the
    oracle side."""
    import numpy as np

    got = {
        r.lang: (r.n_media, r.n_frames_sampled, r.avg_intensity)
        for r in QUERIES["q173_multimodal_video"].builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()

    def frame_means(d: int) -> list[float]:
        w, h, n_frames = 8 + d % 5, 6 + d % 3, 2 + d % 4
        duration = n_frames * 250
        means = []
        for ts in range(0, duration, 500):
            f = min(ts * n_frames // duration, n_frames - 1)
            px = ((np.arange(w * h * 3) + d + 7 * f) % 256).astype(np.uint8)
            means.append(round(float(px.mean()), 2))
        return means

    acc: dict[str, list[float]] = {}
    media: dict[str, set[int]] = {}
    for r in docs:
        ms = frame_means(int(r.doc_id))
        acc.setdefault(r.lang, []).extend(ms)
        media.setdefault(r.lang, set()).add(r.doc_id)
    want = {
        lang: (len(media[lang]), len(v), round(sum(v) / len(v), 2))
        for lang, v in acc.items()
    }
    assert got == want
