"""Law-pinning tests for the pretraining-corpus tier (q205-q208):
properties the DuckDB value-hash alone can't pin — q205's span
maximality/merging, q206's DSIR ordering law, q207's integer
rate/epoch identities, and q208's block-count invariance (the proof
that the grouped-kernel topology computes the same answer as a
broadcast join at any block count)."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_pretrain import (
    _MIX_SPEC,
    _SPAN_G,
    q208_eval_decontamination,
)

QUERIES = {n: q.builder for n, q in all_queries().items()}


def _span_census(spark, tmp_path, texts):
    """Run q205 over a crafted single-lang corpus written as parquet."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = QUERIES["q205_duplicate_span_census"](spark, d).collect()
    return {r.lang: r for r in rows}


def test_q205_maximal_span_merges_overlapping_grams(spark, tmp_path):
    """An 8-token substring shared by two docs = 4 duplicated 5-gram
    start positions per doc, overlapping; they MUST merge into exactly
    ONE maximal span of 8 tokens per doc (Lee et al.'s span unit), not
    four 5-token spans."""
    shared = "a1 a2 a3 a4 a5 a6 a7 a8"
    texts = [
        f"x1 x2 x3 {shared} y1 y2",
        f"z1 z2 {shared} w1 w2 w3",
        "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",  # no shared 5-gram
    ]
    c = _span_census(spark, tmp_path, texts)["en"]
    assert c.n_docs == 3
    assert c.n_docs_dup == 2  # third doc clean
    assert c.n_spans == 2  # one MERGED island per contaminated doc
    assert c.dup_tokens == 16  # 8 tokens in each of the two docs


def test_q205_disjoint_spans_stay_separate(spark, tmp_path):
    """Two duplicated regions separated by enough unique tokens must
    NOT merge: island count reflects genuinely distinct spans."""
    s1 = "b1 b2 b3 b4 b5"
    s2 = "c1 c2 c3 c4 c5"
    texts = [
        f"{s1} m1 m2 m3 m4 m5 m6 {s2}",
        f"{s1} n1 n2 n3 n4 n5 n6 {s2}",
    ]
    c = _span_census(spark, tmp_path, texts)["en"]
    assert c.n_spans == 4  # 2 spans x 2 docs
    assert c.dup_tokens == 20  # 5 + 5 per doc


def test_q205_short_docs_guard(spark, tmp_path):
    """Docs shorter than G tokens produce no grams (the sequence()
    guard branch) instead of a descending-sequence explosion."""
    c = _span_census(spark, tmp_path, ["one two", "one two"])["en"]
    assert c.n_docs == 2 and c.n_docs_dup == 0 and c.n_spans == 0
    assert c.dup_tokens == 0 and c.dup_milli == 0
    assert _SPAN_G > 2  # the premise of the test


def test_q206_dsir_orders_target_like_docs_first(spark, tmp_path):
    """DSIR law: with target = lang('en'), a doc written entirely in
    tokens that ONLY occur in the target slice must outscore a doc of
    tokens that only occur outside it — ln(p/q) is positive for
    target-exclusive grams and negative for target-absent ones."""
    d = str(tmp_path / "sf")
    rows = [
        (0, "good good good stuff stuff", "en", "s", 25),
        (1, "good stuff filler filler filler", "en", "s", 31),
        (2, "bad bad junk junk junk", "de", "s", 22),
        (3, "good stuff bad junk filler", "de", "s", 26),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = QUERIES["q206_dsir_importance"](spark, d).collect()
    imp = {r.doc_id: r.imp_micro for r in out}
    assert imp[0] > imp[3] > imp[2]  # en-exclusive > mixed > en-absent
    assert out[0].doc_id == 0  # ordered head is the most target-like


def test_q207_rate_epoch_identities(spark, sf_dir):
    """Integer identities of the mix plan: target shares sum to 1000;
    epochs == ceil(desired/tokens); rate_milli > 1000 iff the language
    is upsampled (epochs >= 2); desired tokens partition ~T_total."""
    assert sum(m for _, m in _MIX_SPEC) == 1000
    rows = QUERIES["q207_mixture_epochs"](spark, sf_dir).collect()
    assert len(rows) == len(_MIX_SPEC)
    t_total = sum(r.tokens for r in rows)
    for r in rows:
        desired = next(m for l, m in _MIX_SPEC if l == r.lang) * t_total // 1000
        assert r.desired_tokens == desired
        assert r.epochs == -(-desired // r.tokens)  # ceil
        assert r.rate_milli == 1000 * desired // r.tokens
        assert (r.rate_milli > 1000) == (r.epochs >= 2) or desired % r.tokens == 0
    # floor losses only: the planned tokens never exceed the budget
    assert sum(r.desired_tokens for r in rows) <= t_total


def test_q208_block_count_invariance(spark, sf_dir, monkeypatch):
    """The grouped-kernel topology is a physical choice: the census
    must be bit-identical at B=1 (one group = a true broadcast join)
    and at B=8 (the default fan-out). This is the exactness proof the
    oracle can't give (it only sees one B)."""
    import multi_threaded_mapreduce_framework_spark.queries.t2_pretrain as m

    base = {
        tuple(r)
        for r in q208_eval_decontamination(spark, sf_dir).collect()
    }
    monkeypatch.setattr(m, "_DECON_BLOCKS", 1)
    single = {
        tuple(r)
        for r in q208_eval_decontamination(spark, sf_dir).collect()
    }
    assert base == single and len(base) > 0


def test_q208_split_is_disjoint_and_total(spark, sf_dir):
    """Census coverage: every non-eval vector is scored exactly once —
    sum(n_train) equals the train-split cardinality."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    out = q208_eval_decontamination(spark, sf_dir)
    n_train = out.agg(F.sum("n_train")).collect()[0][0]
    expect = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 20 != 0)
        .count()
    )
    assert n_train == expect


def test_q211_kl_nonnegative_and_zero_for_identical_dist(spark, tmp_path, sf_dir):
    """Gibbs' inequality: KL >= 0 always; and a corpus with a single
    source has P_source == P_corpus exactly (same counts, same totals),
    so its smoothed KL is exactly 0.0."""
    rows = QUERIES["q211_source_kl_drift"](spark, sf_dir).collect()
    assert len(rows) > 1 and all(r.kl_drift >= 0 for r in rows)
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, "alpha beta gamma delta", "en", "only", 22) for i in range(4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    one = QUERIES["q211_source_kl_drift"](spark, d).collect()
    assert len(one) == 1 and one[0].kl_drift == 0.0


def test_q212_greedy_fill_laws(spark, tmp_path):
    """The budget-fill contract: selection is a prefix of the
    (quality DESC, doc_id) order, the quota is reached (crossing doc
    included), and dropping the crossing doc would fall below quota."""
    d = str(tmp_path / "sf")
    # 4 docs, 10 tokens each (40 total, quota 20); quality strictly
    # decreasing with doc_id by construction (longer words score higher
    # via the mean-word-length term)
    texts = [
        "aaaaaaaa " * 9 + "aaaaaaaa",
        "aaaaaa " * 9 + "aaaaaa",
        "aaaa " * 9 + "aaaa",
        "aa " * 9 + "aa",
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = QUERIES["q212_quota_prefix_select"](spark, d).collect()[0]
    assert r.total_tokens == 40 and r.n_docs == 4
    # quota = 20: doc0 (prefix 0 < 20) and doc1 (prefix 10 < 20) are
    # selected; doc2 (prefix 20) is not
    assert r.n_selected == 2 and r.tokens_selected == 20
    assert r.tokens_selected >= r.total_tokens // 2


def test_q212_fixture_quota_reached(spark, sf_dir):
    """On the real fixture every language's selection covers its quota
    (tokens_selected >= total div 2) without exceeding one crossing
    doc's worth of overshoot relative to the largest selected doc."""
    for r in QUERIES["q212_quota_prefix_select"](spark, sf_dir).collect():
        assert r.tokens_selected >= r.total_tokens // 2
        assert 0 < r.n_selected <= r.n_docs
