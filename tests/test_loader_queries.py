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

    rows = {r.lang: r for r in QUERIES["q217_packing_first_fit"](spark, sf_dir).collect()}
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


def test_q220_exact_reference_selection(spark, sf_dir):
    """The ES sample is deterministic given the portable hash: the
    Spark selection must equal a pure-Python recomputation exactly
    (ids, weights, and 4 dp keys)."""
    import math

    from multi_threaded_mapreduce_framework_spark.sources import load_table

    out = QUERIES["q220_weighted_sample_es"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("w")
    ).collect()
    keyed = []
    for r in docs:
        h = ((r.doc_id % 1000003) * 2654435761) % 1000003
        keyed.append((-math.log((h + 1) / 1000004.0) / r.w, r.doc_id, r.w))
    keyed.sort()
    want = [(d, w, round(k, 4)) for k, d, w in keyed[:50]]
    got = [(r.doc_id, r.w, r.es_key) for r in out]
    assert got == want


def test_q220_weight_bias(spark, tmp_path):
    """PPS law (sanity, deterministic here): with equal hashes ruled
    out, a doc with enormous weight gets a near-zero key and MUST be
    selected over tiny-weight docs at the same u."""
    rows = [(i, "w " * (2000 if i == 3 else 5), "en", "s", 1) for i in range(60)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t.strip(), l, s, n) for i, t, l, s, n in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id for r in QUERIES["q220_weighted_sample_es"](spark, d).collect()}
    assert 3 in got  # the heavy doc is in any 50-of-60 PPS sample


def test_q221_burstiness_bounds_and_clock_law(spark, tmp_path):
    """B is within (-1, 1); a perfectly regular clock user (constant
    gaps) has sd = 0 -> B = -1 -> bucket 0."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfect 60 s clock, 10 events
    rows += [(i, base + dt.timedelta(seconds=60 * i), 1, "click", 0.0, "{}")
             for i in range(10)]
    # user 2: bursty — 5 quick pairs separated by huge gaps
    t = base
    eid = 100
    for b in range(6):
        rows.append((eid, t, 2, "click", 0.0, "{}")); eid += 1
        rows.append((eid, t + dt.timedelta(seconds=1), 2, "click", 0.0, "{}")); eid += 1
        t += dt.timedelta(hours=12)
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.bucket: r for r in
           QUERIES["q221_interarrival_burstiness"](spark, d).collect()}
    assert 0 in out and out[0].mean_burst == -1.0  # the clock user
    assert any(b >= 5 for b in out)  # the bursty user lands right of Poisson
    for r in out.values():
        assert -1.0 <= r.mean_burst <= 1.0


def test_q223_heaps_identities(spark, sf_dir):
    """vocab_final equals the per-lang distinct token count; exactly
    10 checkpoints whenever ndocs >= 10; beta >= 0 (vocabulary never
    shrinks) and beta <= 1 (can't grow faster than linear)."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    rows = {r.lang: r for r in QUERIES["q223_heaps_law_fit"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    vocab = {}
    for d in docs:
        vocab.setdefault(d.lang, set()).update(d.text.split(" "))
    for lang, r in rows.items():
        assert r.vocab_final == len(vocab[lang])
        assert r.n_checkpoints == 10
        assert 0.0 <= r.heaps_beta <= 1.0


def test_q224_confusion_is_total_and_separable_langs_classify(spark, tmp_path):
    """Row sums cover every document; on a corpus whose languages use
    DISJOINT alphabets the classifier is perfect (diagonal matrix) —
    the crafted separable case that pins the argmax plumbing."""
    rows = [
        (i, "aaa bbb aab abb baa " * 3, "en", "s", 1) for i in range(0, 10)
    ] + [
        (i, "xxx yyy xxy xyy yxx " * 3, "de", "s", 1) for i in range(10, 20)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r.lang, r.predicted): r.cnt for r in
           QUERIES["q224_ngram_langid_confusion"](spark, d).collect()}
    assert out == {("en", "en"): 10, ("de", "de"): 10}


def test_q224_total_coverage_on_fixture(spark, sf_dir):
    """Every document lands in exactly one confusion cell."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    total = sum(r.cnt for r in
                QUERIES["q224_ngram_langid_confusion"](spark, sf_dir).collect())
    assert total == load_table(spark, sf_dir, "documents").count()
