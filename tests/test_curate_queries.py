"""Invariant tests for the round-6 curation queries (q195/q196):
properties the DuckDB value-hash alone can't pin — the winnowing
match guarantee, the MOSS rightmost tiebreak, and the stream-join
readback's session cache discipline."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_curate import (
    _WIN_K,
    _WIN_W,
    winnow_fingerprints,
)

QUERIES = all_queries()


def _fps(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = winnow_fingerprints(docs).select("doc_id", "fps").collect()
    return {r.doc_id: set(r.fps) for r in rows}


def test_winnowing_match_guarantee(spark):
    """Schleimer et al. Theorem: any substring match of length
    >= K + W - 1 (= 8 here) yields at least one SHARED fingerprint.
    Two documents with different padding around a common 12-char
    substring must intersect; two with no common 5-gram must not."""
    shared = "hello winnow"
    a = f"qqqq {shared} zzzz"
    b = f"mmmmmm {shared} tttt"
    c = "0123456789"  # digits: no 5-gram in common with a or b
    fps = _fps(spark, [a, b, c])
    assert fps[0] & fps[1], "shared 12-char substring must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_winnowing_rightmost_tiebreak(spark):
    """Constant text => every gram hash equal => each window's min is
    its RIGHTMOST position (the MOSS tiebreak): all m - W + 1 windows
    select distinct positions, and exactly one distinct hash value."""
    n = 20
    docs = spark.createDataFrame([(0, "a" * n)], "doc_id bigint, text string")
    row = winnow_fingerprints(docs).select(
        F.size("fps").alias("n_sel"),
        F.size(F.array_distinct("fps")).alias("n_hashes"),
    ).collect()[0]
    m = n - _WIN_K + 1
    assert row.n_sel == m - _WIN_W + 1
    assert row.n_hashes == 1


def test_winnowing_density_theory(spark, sf_dir):
    """Expected density of random-text winnowing is 2/(W+1) = 0.4; the
    fixture corpus must land near it (the census the oracle hash-gates
    already pins the exact value; this pins the THEORY link)."""
    out = QUERIES["q195_winnowing_fingerprints"].builder(spark, sf_dir).collect()
    for r in out:
        assert 0.35 <= r.density <= 0.45, (r.lang, r.density)


def test_q196_cache_and_lag_bounds(spark, sf_dir):
    """The stream runs ONCE per (app, sf) — a second build must reuse
    the session cache — and every attributed pair respects the join's
    range bound: 0 <= min_lag_us and per-user lags sum within
    n_pairs * 1 hour."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_streamq import (
        _MATVIEW_STATE_CACHE,
    )

    build = QUERIES["q196_stream_stream_join_readback"].builder
    first = {tuple(r) for r in build(spark, sf_dir).collect()}
    key = (spark.sparkContext.applicationId, sf_dir, "ssjoin")
    assert key in _MATVIEW_STATE_CACHE
    sentinel = _MATVIEW_STATE_CACHE[key]
    second = {tuple(r) for r in build(spark, sf_dir).collect()}
    assert _MATVIEW_STATE_CACHE[key] is sentinel, "stream must not re-run"
    assert first == second and first
    hour_us = 3_600 * 1_000_000
    for user_id, n_pairs, n_clicks, n_purchases, sum_lag, min_lag in first:
        assert 0 <= min_lag <= hour_us
        assert min_lag <= sum_lag <= n_pairs * hour_us
        assert 1 <= n_clicks <= n_pairs and 1 <= n_purchases <= n_pairs

def test_q273_left_join_flushes_and_reconciles(spark, sf_dir):
    """The left-outer readback census must (a) reuse its session cache,
    (b) really contain NULL-FLUSHED rows (some user has unmatched
    clicks — otherwise the row degenerates to q196), (c) account for
    every click exactly once across matched+unmatched (n_clicks per
    user == that user's raw click count, and n_rows == n_matched +
    n_unmatched), and (d) respect the join's range bound on lags."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_streamq import (
        _MATVIEW_STATE_CACHE,
    )
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    build = QUERIES["q273_stream_left_join_readback"].builder
    rows = {r.user_id: r for r in build(spark, sf_dir).collect()}
    key = (spark.sparkContext.applicationId, sf_dir, "ssljoin")
    assert key in _MATVIEW_STATE_CACHE
    sentinel = _MATVIEW_STATE_CACHE[key]
    again = {r.user_id: r for r in build(spark, sf_dir).collect()}
    assert _MATVIEW_STATE_CACHE[key] is sentinel, "stream must not re-run"
    assert rows.keys() == again.keys() and rows

    clicks = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .filter("event_type = 'click'")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every clicking user appears (left join drops no left rows)
    assert rows.keys() == clicks.keys()
    hour_us = 3_600 * 1_000_000
    total_unmatched = 0
    for uid, r in rows.items():
        assert r.n_rows == r.n_matched + r.n_unmatched_clicks
        assert r.n_clicks == clicks[uid]
        assert 0 <= r.sum_lag_us <= r.n_matched * hour_us
        if r.n_matched == 0:
            assert r.sum_lag_us == 0
        total_unmatched += r.n_unmatched_clicks
    assert total_unmatched > 0, "no null-flushed outer rows — gate degenerate"
