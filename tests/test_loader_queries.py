"""Law-pinning tests for the loader tier (q217-q219): the FFD packing
laws and reference parity (q217 is rows-only by contract, so these
tests ARE its value gate), the Zipf census identities, and the
drift-cosine self-consistency law."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_loader import _FFD_L

QUERIES = {n: q.builder for n, q in all_queries().items()}


def _ffd_reference(tokens, L):
    """Independent FFD fold (the spec, written differently)."""
    fills = []
    for x in sorted([t for t in tokens if t <= L], key=lambda v: (-v,)):
        placed = False
        for i in range(len(fills)):
            if fills[i] + x <= L:
                fills[i] += x
                placed = True
                break
        if not placed:
            fills.append(x)
    return fills


def test_q217_ffd_laws_and_reference_parity(spark, sf_dir):
    """Capacity, conservation, the first-fit at-most-one-half-empty-bin
    theorem (any two bins <= L/2 contradict first-fit), q204
    lower-bound consistency, and bin-count parity with an independent
    reference fold over the same token multiset."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    rows = {r.lang: r for r in QUERIES["q217_packing_best_fit"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("t")
    ).collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r.t)
    assert set(rows) == set(by_lang)
    for lang, r in rows.items():
        toks = by_lang[lang]
        packable = [t for t in toks if t <= _FFD_L]
        fills = _ffd_reference(toks, _FFD_L)
        assert r.n_bins == len(fills)  # reference parity
        assert r.n_docs_packed == len(packable)
        assert r.n_oversize == len(toks) - len(packable)
        assert r.total_tokens_packed == sum(packable)
        assert r.waste_tokens == r.n_bins * _FFD_L - r.total_tokens_packed
        # q204-style lower bound: can't beat ceil(total/L)
        assert r.n_bins >= -(-r.total_tokens_packed // _FFD_L)
        # first-fit theorem on the reference fills
        assert sum(1 for f in fills if f <= _FFD_L // 2) <= 1


def test_q218_census_identities(spark, sf_dir):
    """vocab >= hapax; tokens >= vocab; hapax_milli law; slope is
    negative (frequencies are non-increasing in rank by construction,
    strictly somewhere on real text)."""
    for r in QUERIES["q218_zipf_hapax_census"](spark, sf_dir).collect():
        assert 0 <= r.hapax <= r.vocab <= r.tokens
        assert r.hapax_milli == 1000 * r.hapax // r.vocab
        assert r.zipf_slope < 0


def test_q219_drift_self_consistency(spark, tmp_path):
    """A corpus with ONE source has mean_source == mean_corpus, so the
    drift cosine is exactly 1.0 (up to the declared 4 dp rounding)."""
    import random

    rng = random.Random(11)
    emb = [(i, [rng.uniform(-1, 1) for _ in range(64)], 0) for i in range(30)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        [(i, "x y z", "en", "only", 5) for i in range(30)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = QUERIES["q219_source_embedding_drift"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0].n_vecs == 30 and math.isclose(rows[0].drift_cos, 1.0)
