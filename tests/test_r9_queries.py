"""Law-pinning tests for the round-9 band (q247-q251): the multimodal
integer census replayed against independent numpy/stdlib laws, the
bounded-state stream dedup tied to the unbounded variant and the batch
truth, the banded threshold curve tied to q35's pair universe at the
band threshold, the VACUUM sweep's scope/retention laws plus its row
preservation, and the scripting loop's fixed point replayed in
Python."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = {n: q.builder for n, q in all_queries().items()}


# ------------------------------------------------------------------ q247
def test_media_census_kernel_exact_vs_independent_decoders(spark):
    """media_census values replayed per payload with INDEPENDENT
    parsers: stdlib wave for the WAV leg, pure-python byte walking for
    PPM, and the numpy ramp law for both image formats (the PNG leg
    round-trips encode_png -> zlib -> parse, so a byte-level bug in
    either direction breaks pix_sum)."""
    import io
    import wave as wave_mod

    import numpy as np

    from multi_threaded_mapreduce_framework_spark.operators.multimodal import (
        encode_png,
        media_census,
        wav_sine_bytes,
    )

    payloads = []
    expect = {}
    for d in (0, 1, 7, 254, 255, 256, 511):
        wav = wav_sine_bytes(220.0 + (d % 16) * 55.0, 100 + (d % 32) * 25, 8000)
        with wave_mod.open(io.BytesIO(wav), "rb") as w:
            n = w.getnframes()
            assert w.getframerate() == 8000
        payloads.append((1000 + d, bytearray(wav)))
        expect[1000 + d] = ("wav", 0, 0, 0, 0, n, 1000 * n // 8000, len(wav))
        w_, h_ = 8 + d % 8, 6 + d % 5
        px = ((np.arange(w_ * h_ * 3, dtype=np.int64) + d) % 256).astype(
            np.uint8
        )
        raw = (
            encode_png(px.reshape(h_, w_, 3))
            if d % 2
            else b"P6\n%d %d\n255\n" % (w_, h_) + px.tobytes()
        )
        payloads.append((2000 + d, bytearray(raw)))
        expect[2000 + d] = (
            "png" if d % 2 else "ppm",
            w_,
            h_,
            3 * w_ * h_,
            int(px.sum()),
            0,
            0,
            len(raw),
        )
    df = spark.createDataFrame(payloads, "media_id bigint, payload binary")
    out = {
        r.media_id: (
            r.format,
            r.width,
            r.height,
            r.pix_bytes,
            r.pix_sum,
            r.n_samples,
            r.dur_ms,
            r.byte_len,
        )
        for r in media_census(df).collect()
    }
    assert out == expect


def test_media_census_rejects_unknown_container(spark):
    import pytest as _pytest

    from multi_threaded_mapreduce_framework_spark.operators.multimodal import (
        media_census,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a not supported"))],
        "media_id bigint, payload binary",
    )
    with _pytest.raises(Exception, match="unknown media container"):
        media_census(df).collect()


def test_q247_census_matches_python_corpus_replay(spark, sf_dir):
    """The full q247 output replayed in Python from doc_ids alone (the
    same laws the DuckDB oracle encodes, derived independently here
    with real numpy ramps rather than the closed-form window sum)."""
    import numpy as np

    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    acc: dict[str, list[int]] = {}
    for d in ids:
        w, h = 8 + d % 8, 6 + d % 5
        px = (np.arange(w * h * 3, dtype=np.int64) + d) % 256
        fmt = "png" if d % 2 else "ppm"
        a = acc.setdefault(fmt, [0] * 8)
        a[0] += 1
        a[1] += w
        a[2] += h
        a[3] += 3 * w * h
        a[4] += int(px.sum())
        if fmt == "ppm":
            a[7] += 9 + len(str(w)) + len(str(h)) + 3 * w * h
        dur = 100 + (d % 32) * 25
        aw = acc.setdefault("wav", [0] * 8)
        aw[0] += 1
        aw[5] += 8 * dur
        aw[6] += dur
        aw[7] += 44 + 16 * dur
    out = {
        r.format: [
            r.n_media,
            r.w_sum,
            r.h_sum,
            r.pix_bytes,
            r.pix_sum,
            r.n_samples,
            r.dur_ms,
            r.known_bytes,
        ]
        for r in QUERIES["q247_multimodal_meta_census"](spark, sf_dir).collect()
    }
    assert out == acc


# ------------------------------------------------------------------ q248
def test_q248_bounded_dedup_equals_unbounded_and_batch(spark, sf_dir):
    """The bounded-state variant absorbs exactly the duplicate wave:
    its census equals q244's unbounded-variant census equals the batch
    census over the un-duplicated fixture — dropDuplicatesWithin-
    Watermark is a drop-in for dropDuplicates whenever redelivery
    lands inside the delay (the contract the docstring declares)."""
    wm = {
        r.event_type: r.cnt
        for r in QUERIES["q248_stream_dedup_watermark"](spark, sf_dir).collect()
    }
    unbounded = {
        r.event_type: r.cnt
        for r in QUERIES["q244_stream_dedup_readback"](spark, sf_dir).collect()
    }
    batch = {
        r.event_type: r.cnt
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    assert wm == unbounded == batch and sum(batch.values()) > 0


# ------------------------------------------------------------------ q249
def test_q249_t500_point_is_q35s_universe(spark, sf_dir):
    """The verdict-mandated tie: at t=500 (q35's JACCARD_THRESHOLD),
    the banded curve's n_pairs counts exactly q35's output pairs and
    mean_j_milli is their integer-milli mean recomputed from shingle
    sets — curve and near-dup pass agree on the same universe."""
    from multi_threaded_mapreduce_framework_spark.functions.texthash import (
        word_shingle_hashes,
    )
    from multi_threaded_mapreduce_framework_spark.queries.t2_dedup import (
        JACCARD_THRESHOLD,
    )

    assert int(1000 * JACCARD_THRESHOLD) == 500
    curve = {
        r.t_milli: r
        for r in QUERIES["q249_banded_threshold_curve"](spark, sf_dir).collect()
    }
    q35_pairs = [
        (r.d1, r.d2)
        for r in QUERIES["q35_minhash_lsh"](spark, sf_dir).collect()
    ]
    assert curve[500].n_pairs == len(q35_pairs)
    if q35_pairs:
        sh = {
            r.doc_id: set(r.hs)
            for r in load_table(spark, sf_dir, "documents")
            .filter(F.size(F.split("text", " ")) >= 3)
            .select("doc_id", word_shingle_hashes("text").alias("hs"))
            .collect()
        }
        js = [
            1000
            * len(sh[d1] & sh[d2])
            // (len(sh[d1]) + len(sh[d2]) - len(sh[d1] & sh[d2]))
            for d1, d2 in q35_pairs
        ]
        assert curve[500].mean_j_milli == sum(js) // len(js)


def test_q249_monotone_in_threshold(spark, sf_dir):
    """Raising the threshold never admits pairs and never lowers the
    qualifying mean: n_pairs non-increasing, mean_j_milli
    non-decreasing while any pair qualifies."""
    rows = sorted(
        QUERIES["q249_banded_threshold_curve"](spark, sf_dir).collect(),
        key=lambda r: r.t_milli,
    )
    assert [r.t_milli for r in rows] == [300, 500, 700]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        if b.n_pairs > 0:
            assert b.mean_j_milli >= a.mean_j_milli
        assert b.mean_j_milli >= b.t_milli or b.n_pairs == 0


# ------------------------------------------------------------------ q250
def test_vacuum_swap_dirs_retention_and_scope(spark, tmp_path):
    """The operator's two safety laws, exercised directly on disk:
    (1) SCOPE — only `._compact-*` / `._old-*` siblings of the target
    are candidates; the live dataset dir, unrelated siblings, and
    leftovers of OTHER datasets survive; (2) RETENTION — leftovers
    younger than min_age_s survive (the in-flight-rewrite guard),
    then fall to a zero-retention sweep."""
    import os

    from multi_threaded_mapreduce_framework_spark.operators.compact import (
        vacuum_swap_dirs,
    )

    base = str(tmp_path / "ds")
    spark.range(10).write.mode("overwrite").parquet(base)
    for name in (
        "ds._compact-aaa",
        "ds._old-bbb",
        "other._old-ccc",   # different dataset's leftover
        "ds_backup",        # unrelated sibling
    ):
        d = tmp_path / name
        d.mkdir()
        (d / "junk.parquet").write_bytes(b"PAR1junk")
    # retention guard: everything is younger than an hour
    assert vacuum_swap_dirs(base, min_age_s=3600.0) == 0
    assert (tmp_path / "ds._compact-aaa").exists()
    # zero retention: exactly the two ds-scoped leftovers go
    assert vacuum_swap_dirs(base, min_age_s=0.0) == 2
    assert not (tmp_path / "ds._compact-aaa").exists()
    assert not (tmp_path / "ds._old-bbb").exists()
    assert (tmp_path / "other._old-ccc").exists()
    assert (tmp_path / "ds_backup").exists()
    assert spark.read.parquet(base).count() == 10  # live data untouched


def test_q250_census_matches_q240_law_plus_orphans(spark, sf_dir):
    """q250's rows/files columns obey q240's pure row law (replayed in
    Python from the batch census) and every partition reports exactly
    the two planted orphans removed."""
    import math

    batch = {
        r.event_type: r.cnt
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    from multi_threaded_mapreduce_framework_spark.queries.t2_r8 import (
        _OPT_FILES_PER_PART,
    )

    out = QUERIES["q250_vacuum_retention_census"](spark, sf_dir).collect()
    assert {r.event_type for r in out} == set(batch)
    for r in out:
        n = batch[r.event_type]
        target = math.ceil(n / _OPT_FILES_PER_PART)
        assert r.n_rows == n
        assert r.files_after == math.ceil(n / target)
        assert r.orphans_removed == 2


# ------------------------------------------------------------------ q251
def test_q251_script_equals_python_loop_replay(spark, sf_dir):
    """The scripting loop's fixed point replayed in Python: the same 3
    iterations of integer trimmed mean over n_chars, then the same
    window census — plus the partition law n_in + n_below + n_above ==
    docs per language."""
    rows = [
        (r.lang, r.n_chars)
        for r in load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    ]
    lo, hi = 0, 2**63 - 1
    m = 0
    for _ in range(3):
        window = [c for _, c in rows if lo <= c <= hi]
        m = sum(window) // len(window)
        lo, hi = m // 2, m * 2
    out = {
        r.lang: r
        for r in QUERIES["q251_sql_scripting_trimmed_census"](
            spark, sf_dir
        ).collect()
    }
    per_lang: dict[str, list[int]] = {}
    for lang, c in rows:
        per_lang.setdefault(lang, []).append(c)
    assert set(out) == set(per_lang)
    for lang, cs in per_lang.items():
        r = out[lang]
        assert r.m_final == m
        assert r.n_in == sum(1 for c in cs if lo <= c <= hi)
        assert r.n_below == sum(1 for c in cs if c < lo)
        assert r.n_above == sum(1 for c in cs if c > hi)
        assert r.n_in + r.n_below + r.n_above == len(cs)
