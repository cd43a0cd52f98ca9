"""Law-pinning tests for the round-8 band (q237-q240): MapState
snapshot monotonicity/convergence, the k-anonymity census replayed in
pure Python, Matryoshka's zero-tail identity (a truncation that loses
nothing must reproduce the full ranking exactly), and the compaction
rewrite's preservation + plan laws exercised directly on disk."""

from __future__ import annotations

import math
import os
import random

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_r8 import (
    _KANON_GRID,
    _MRL_PROBES,
    _MRL_TOPK,
    _OPT_FILES_PER_PART,
)
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = {n: q.builder for n, q in all_queries().items()}


def test_q237_mapstate_snapshots_bounded_and_converged(spark, sf_dir):
    """Update-mode MapState snapshots never overshoot: every emitted
    (user, type) cnt is <= the batch count, every count is positive,
    and the max over snapshots equals the batch count exactly (the
    monotone-readback law the query's max() relies on)."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_streamq import (
        _MATVIEW_STATE_CACHE,
    )

    out = {
        (r.user_id, r.event_type): r.cnt
        for r in QUERIES["q237_tws_mapstate_census"](spark, sf_dir).collect()
    }
    batch = {
        (r.user_id, r.event_type): r.cnt
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert out == batch
    raw = _MATVIEW_STATE_CACHE[
        (spark.sparkContext.applicationId, sf_dir, "tws_map")
    ].collect()
    assert raw  # the stream really emitted snapshots
    seen_max: dict = {}
    for r in raw:
        k = (r.user_id, r.event_type)
        assert 1 <= r.cnt <= batch[k], (k, r.cnt, batch[k])
        seen_max[k] = max(seen_max.get(k, 0), r.cnt)
    assert seen_max == batch


def test_q238_census_vs_python(spark, sf_dir):
    """Full Python replay of the quasi-identifier census plus the
    k-monotonicity identities: groups/rows below k are nondecreasing in
    k, bounded by the totals, and the milli law holds."""
    rows = {r.k: r for r in QUERIES["q238_k_anonymity_census"](spark, sf_dir).collect()}
    assert set(rows) == set(_KANON_GRID)
    groups: dict = {}
    total = 0
    for r in load_table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars"
    ).collect():
        key = (r.lang, r.source, r.n_chars // 100)
        groups[key] = groups.get(key, 0) + 1
        total += 1
    prev_g = prev_r = -1
    for k in sorted(_KANON_GRID):
        r = rows[k]
        gb = sum(1 for g in groups.values() if g < k)
        rb = sum(g for g in groups.values() if g < k)
        assert (r.groups_below_k, r.rows_below_k) == (gb, rb)
        assert r.n_groups == len(groups)
        assert r.at_risk_milli == 1000 * rb // total
        assert 0 <= r.rows_below_k <= total
        assert r.groups_below_k >= prev_g and r.rows_below_k >= prev_r
        prev_g, prev_r = r.groups_below_k, r.rows_below_k


def test_q239_zero_tail_identity(spark, tmp_path):
    """If dims 17-64 are all zero, truncation to 16 dims loses NOTHING:
    both cosine folds are bit-identical (the zero terms add 0.0), so
    the two rankings coincide and every probe reports a perfect
    overlap of 10 / Jaccard 1000."""
    rng = random.Random(7)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(16)] + [0.0] * 48)
        for i in range(30)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, v, 0) for i, v in vecs],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = QUERIES["q239_matryoshka_truncation"](spark, d).collect()
    assert len(out) == _MRL_PROBES
    for r in out:
        assert (r.n_common, r.jaccard_milli) == (_MRL_TOPK, 1000)


def test_q239_ranking_replay_vs_python(spark, sf_dir):
    """Replay both rankings in pure Python (same IEEE expression
    order: left-to-right dot folds, sqrt norms multiplied before the
    division, vec_id tiebreak) and pin the full output."""
    out = {r.probe_id: r for r in QUERIES["q239_matryoshka_truncation"](spark, sf_dir).collect()}
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    norms = {
        i: (math.sqrt(dot(v, v)), math.sqrt(dot(v[:16], v[:16])))
        for i, v in vecs.items()
    }
    probes = sorted(vecs)[:_MRL_PROBES]
    assert set(out) == set(probes)
    for pid in probes:
        pv = vecs[pid]
        pn64, pn16 = norms[pid]
        cf, ct = [], []
        for i, v in vecs.items():
            if i == pid:
                continue
            n64, n16 = norms[i]
            cf.append((dot(v, pv) / (n64 * pn64), i))
            ct.append((dot(v[:16], pv[:16]) / (n16 * pn16), i))
        top_f = {i for _, i in sorted(cf, key=lambda t: (-t[0], t[1]))[:_MRL_TOPK]}
        top_t = {i for _, i in sorted(ct, key=lambda t: (-t[0], t[1]))[:_MRL_TOPK]}
        n = len(top_f & top_t)
        assert out[pid].n_common == n
        assert out[pid].jaccard_milli == 1000 * n // (2 * _MRL_TOPK - n)


def test_q240_compaction_rewrite_laws(spark, tmp_path):
    """The row-targeted rewrite, exercised directly: exact planned file
    count, zero rows lost (full multiset equality), and no temp/old
    directories survive the atomic swap."""
    from multi_threaded_mapreduce_framework_spark.operators.compact import (
        _parquet_files,
        compact_parquet_dir_rows,
    )

    d = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 7 AS x").repartition(12).write.mode(
        "overwrite"
    ).parquet(d)
    before = sorted((r.id, r.x) for r in spark.read.parquet(d).collect())
    assert len(_parquet_files(d)) == 12
    stats = compact_parquet_dir_rows(spark, d, target_rows=30)
    planned = math.ceil(100 / 30)
    assert stats.files_before == 12
    assert stats.files_after == planned == len(_parquet_files(d))
    after = sorted((r.id, r.x) for r in spark.read.parquet(d).collect())
    assert after == before
    leftovers = [f for f in os.listdir(str(tmp_path)) if "._" in f]
    assert leftovers == []
    assert not any(
        "._compact" in f or "._old" in f for f in os.listdir(str(tmp_path / "t"))
    )
    # idempotent no-op once at target
    stats2 = compact_parquet_dir_rows(spark, d, target_rows=30)
    assert (stats2.files_before, stats2.files_after) == (planned, planned)


def test_q240_census_matches_plan_law(spark, sf_dir):
    """The declared census obeys the row law: files_after ==
    ceil(rows / ceil(rows / 8)), totals match the events table, and
    every partition ended at-or-under 8 files."""
    rows = QUERIES["q240_optimize_compaction_census"](spark, sf_dir).collect()
    batch = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.event_type: r.n_rows for r in rows} == batch
    for r in rows:
        target = math.ceil(r.n_rows / _OPT_FILES_PER_PART)
        assert r.files_after == math.ceil(r.n_rows / target)
        assert 1 <= r.files_after <= _OPT_FILES_PER_PART
