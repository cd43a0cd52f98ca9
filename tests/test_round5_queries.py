"""Invariant / edge-case tests for the round-5 queries (q174-q182):
properties the DuckDB value-hash alone can't pin — failure modes,
boundary semantics, and hand-computable optima."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.queries import all_queries

QUERIES = all_queries()


def test_q174_greedy_picks_known_optimum(spark, tmp_path):
    """Hand-built corpus with an unambiguous greedy trajectory: doc 0
    covers 6 shingles, doc 1 covers 4 disjoint ones, doc 2 overlaps
    doc 0 entirely except one shingle pair.  Greedy must pick 0, then
    1, then 2 with exactly the marginal gains."""
    rows = [
        (0, "a b c d e f g h"),          # 6 shingles: abc..fgh
        (1, "p q r s t u"),              # 4 disjoint shingles
        (2, "a b c d e f g h i j"),      # doc0's 6 + 2 new (ghi, hij... )
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.round: (r.doc_id, r.gain)
        for r in QUERIES["q174_greedy_coverage"].builder(spark, str(tmp_path)).collect()
    }
    # doc2 has 8 shingles -> it wins round 1; doc1's 4 disjoint come
    # second; doc0 contributes nothing new (subset of doc2), and a
    # zero-gain doc is NOT pickable (its rows vanish from the uncovered
    # relation) — greedy stops early, identically in both engines
    assert got == {1: (2, 8), 2: (1, 4)}


def test_q175_raises_loudly_when_rounds_too_few(spark, tmp_path):
    """A chain deeper than 2^rounds must RAISE, never return wrong
    depths: build the real forest and call with rounds=0 (covers only
    depth 1 via the initial parent pointer)."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_cluster import (
        q175_tree_depth_pointer_jumping,
    )

    sf = "/root/testdata/sf0.001"
    with pytest.raises(RuntimeError, match="unresolved"):
        q175_tree_depth_pointer_jumping(spark, sf, rounds=0).collect()
    # and the declared rounds=6 resolves every chain (depth <= 64)
    out = q175_tree_depth_pointer_jumping(spark, sf).collect()
    assert all(r.depth >= 0 for r in out) and len(out) > 0


def test_q176_half_open_boundary(spark, tmp_path):
    """An interval ending at instant t must NOT overlap one starting at
    t (half-open [s, e)): two such intervals peak at 1, genuinely
    overlapping ones peak at 2.  Events get duration 60 + ((id%900)*61)%900
    seconds; choose event ids/times so the law gives known intervals."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # event_id 0 -> delay 60s; event_id 900 -> delay 60s (law repeats
    # mod 900).  First pair: second event starts EXACTLY when the first
    # ends (+60s) -> no overlap.  Third event overlaps the second.
    rows = [
        (0, base, 1, "click", 0.0, "{}"),
        (900, base + dt.timedelta(seconds=60), 1, "click", 0.0, "{}"),
        (1800, base + dt.timedelta(seconds=90), 1, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = (
        QUERIES["q176_interval_sweep_concurrency"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    assert row.n_intervals == 3
    assert row.max_concurrent == 2  # only the 60s/90s pair overlaps
    # earliest instant attaining the peak = the third interval's start
    assert row.at_s == int((base + dt.timedelta(seconds=90)).timestamp())


def test_q177_hll_error_within_bounds(spark, sf_dir):
    """The self-evaluating HLL must estimate within 5 sigma of the
    exact count (sigma ~ 1.04/sqrt(64) ~ 13%) for every key — a
    correctness check on the register math that the hash-parity oracle
    (which would accept a consistently WRONG estimate in both engines)
    cannot express."""
    for r in QUERIES["q177_portable_hll"].builder(spark, sf_dir).collect():
        assert r.n_exact > 0
        rel = abs(r.hll_est - r.n_exact) / r.n_exact
        assert rel < 0.65, (r.event_type, r.hll_est, r.n_exact)


def test_q182_udtf_matches_q85_chunk_law(spark, sf_dir):
    """The UDTF census must equal the same census computed over q85's
    declared column-algebra chunking — the two tiers share one chunk
    law by contract."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    got = {
        (r.lang, r.n_chunks, r.total_tokens, r.n_full_chunks)
        for r in QUERIES["q182_udtf_chunk_census"].builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    chunks = QUERIES["q85_chunk_documents"].builder(spark, sf_dir)
    want = {
        tuple(r)
        for r in chunks.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("n_tokens") == 32, 1).otherwise(0))
            .cast("bigint")
            .alias("n_full_chunks"),
        )
        .select("lang", "n_chunks", "total_tokens", "n_full_chunks")
        .collect()
    }
    assert got == want


def test_k4_funnel_generalization_vs_nested_exists_oracle(spark, sf_dir):
    """q185 claims 'generalizes to K steps as K-1 chained windows';
    this PROVES it at K=4: signup -> click -> view -> purchase, the
    generic k_step_funnel_matches against a triple-nested-EXISTS
    DuckDB oracle under the same (ts, event_id) total order."""
    import duckdb

    from multi_threaded_mapreduce_framework_spark.queries.t2_corpus import (
        k_step_funnel_matches,
    )
    from multi_threaded_mapreduce_framework_spark.sources import load_table, table_path

    steps = ["signup", "click", "view", "purchase"]
    ev = load_table(spark, sf_dir, "events")
    got = sorted(
        (r.user_id, r.event_id)
        for r in k_step_funnel_matches(ev, steps).select("user_id", "event_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{table_path(sf_dir, 'events')}')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
SELECT s.user_id, s.event_id
FROM e s WHERE s.event_type = 'signup' AND EXISTS (
  SELECT 1 FROM e c WHERE c.user_id = s.user_id AND c.event_type = 'click'
    AND (c.us > s.us OR (c.us = s.us AND c.event_id > s.event_id))
    AND EXISTS (
      SELECT 1 FROM e v WHERE v.user_id = c.user_id AND v.event_type = 'view'
        AND (v.us > c.us OR (v.us = c.us AND v.event_id > c.event_id))
        AND EXISTS (
          SELECT 1 FROM e p WHERE p.user_id = v.user_id
            AND p.event_type = 'purchase'
            AND (p.us > v.us OR (p.us = v.us AND p.event_id > v.event_id)))))
"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
