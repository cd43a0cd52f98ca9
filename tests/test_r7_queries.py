"""Law-pinning tests for the round-7 band (q230, q232-q236): merge
branch census exclusivity/exhaustiveness, the k-center trajectory
replayed by a pure-Python farthest-point fold (the q220 pattern),
tokenizer-fertility identities vs an independent Python census, the
DoReMi update's normalization/monotonicity laws, the quantizer census
vs an exact Python replay, and RRF's cutoff-rank law (absent doc takes
rank 201)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.queries.t2_r7 import (
    _FERT_VOCAB,
    _KCENTER_K,
    _MERGE_NEW_OFFSET,
    _RRF_K,
    _RRF_L,
    _RRF_TOP,
)
from multi_threaded_mapreduce_framework_spark.sources import load_table

QUERIES = {n: q.builder for n, q in all_queries().items()}


def test_q230_merge_branch_census(spark, sf_dir):
    """Replay the MERGE in pure Python from the fixture tables and pin
    the branch laws: I/K/U are mutually exclusive and exhaustive, no
    row survives a matched DELETE, and each branch's balance arithmetic
    is exact (I = delta, K = old balance, U = old + delta)."""
    out = {r.custkey: r for r in QUERIES["q230_merge_into_upsert"](spark, sf_dir).collect()}
    tgt = {
        r.c_custkey: round(r.c_acctbal * 100)
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    totals = {}
    for r in load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect():
        totals[r.o_custkey] = totals.get(r.o_custkey, 0.0) + r.o_totalprice
    cdc = {}
    for k, tot in totals.items():
        cents = round(tot * 100)
        cdc[k] = ("D" if k % 10 == 0 else "U", cents)
        if k % 7 == 3:
            cdc[k + _MERGE_NEW_OFFSET] = ("U", cents)
    expect_keys = {k for k in set(tgt) | set(cdc) if cdc.get(k, (None,))[0] != "D"}
    assert set(out) == expect_keys
    for k, r in out.items():
        in_t, in_c = k in tgt, k in cdc
        assert in_t or in_c
        if not in_t:
            assert r.op == "I" and r.bal_cents == cdc[k][1]
        elif not in_c:
            assert r.op == "K" and r.bal_cents == tgt[k]
        else:
            assert cdc[k][0] == "U"  # matched deletes never surface
            assert r.op == "U" and r.bal_cents == tgt[k] + cdc[k][1]
    # branches exercised exactly as the fixture dictates (no-order
    # customers produce 'K' rows; this fixture has none at sf0.001)
    expect_ops = {"I"} | {
        "K" if k not in cdc else "U"
        for k in tgt
        if cdc.get(k, (None,))[0] != "D"
    }
    assert {r.op for r in out.values()} == expect_ops
    # and at least one matched DELETE really removed a target row
    deleted = {k for k, (op, _) in cdc.items() if op == "D" and k in tgt}
    assert deleted and all(k not in out for k in deleted)


def test_q230_all_branches_on_synthetic_fixture(spark, tmp_path):
    """A hand-built snapshot+batch that provably hits every MERGE
    branch: kept (no change row), updated, matched-delete, inserted.
    Keys: 20 -> D (row vanishes; 20 % 7 != 3 so no insert side), 3 ->
    U and %7==3 so it also inserts 3+OFFSET, 5 -> never orders
    (kept)."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(3, "a", 1.00), (5, "b", 2.00), (20, "c", 3.00)],
        "c_custkey bigint, c_name string, c_acctbal double",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(1, 3, 10.00), (2, 3, 5.00), (3, 20, 7.00)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {
        r.custkey: r
        for r in QUERIES["q230_merge_into_upsert"](spark, d).collect()
    }
    assert set(out) == {3, 5, 3 + _MERGE_NEW_OFFSET}
    assert (out[3].op, out[3].bal_cents) == ("U", 100 + 1500)
    assert (out[5].op, out[5].bal_cents) == ("K", 200)
    ins = out[3 + _MERGE_NEW_OFFSET]
    assert (ins.op, ins.bal_cents) == ("I", 1500)  # 20 deleted, absent


def _py_sqdist(a, b):
    """The exact left-to-right IEEE fold both engines run."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def test_q232_trajectory_parity_with_python_fold(spark, sf_dir):
    """The full (round, vec_id, dist_micro) trajectory must equal a
    pure-Python greedy farthest-point replay bit-for-bit: same seed
    (lowest vec_id), same argmax tiebreak (vec_id asc), same
    left-to-right distance fold, same floor(1e6*d) radius."""
    out = sorted(
        QUERIES["q232_kcenter_coreset"](spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    seed = min(vecs)
    traj = [(1, seed, 0)]
    mind = {
        i: _py_sqdist(v, vecs[seed]) for i, v in vecs.items() if i != seed
    }
    for rnd in range(2, _KCENTER_K + 1):
        pick = max(mind, key=lambda i: (mind[i], -i))
        traj.append((rnd, pick, math.floor(1e6 * mind[pick])))
        del mind[pick]
        pv = vecs[pick]
        for i in list(mind):
            mind[i] = min(mind[i], _py_sqdist(vecs[i], pv))
    assert [(r.round, r.vec_id, r.dist_micro) for r in out] == traj
    # covering radius is non-increasing along the greedy trajectory
    radii = [d for _, _, d in traj[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_q233_fertility_census_vs_python(spark, sf_dir):
    """Independent Python replay of the whole census (tokenize, top-V
    frequency vocabulary with word tiebreak, char-fallback costing):
    every output column must match exactly, plus the identities
    subwords >= words and 0 <= oov_milli <= 1000."""
    out = {r.lang: r for r in QUERIES["q233_tokenizer_fertility"](spark, sf_dir).collect()}
    counts: dict[str, int] = {}
    toks: list[tuple[str, str]] = []
    for r in load_table(spark, sf_dir, "documents").select("lang", "text").collect():
        for w in r.text.split(" "):
            counts[w] = counts.get(w, 0) + 1
            toks.append((r.lang, w))
    vocab = {
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_FERT_VOCAB]
    }
    census: dict[str, list[int]] = {}
    for lang, w in toks:
        c = census.setdefault(lang, [0, 0, 0])  # words, subwords, oov
        c[0] += 1
        c[1] += 1 if w in vocab else len(w)
        c[2] += 0 if w in vocab else 1
    assert set(out) == set(census)
    for lang, (words, subs, oov) in census.items():
        r = out[lang]
        assert (r.words, r.subwords) == (words, subs)
        assert r.fertility_milli == 1000 * subs // words
        assert r.oov_milli == 1000 * oov // words
        assert r.subwords >= r.words and 0 <= r.oov_milli <= 1000


def test_q234_update_laws(spark, sf_dir):
    """The exponentiated-gradient step's laws: loss_milli replays from
    an independent token/char census; the weight replays from the
    literal exp tables (the shift + centi-quantize + table-product
    law — no libm in the gate); weights are a valid distribution (sum
    within the integer-floor loss of 1e6); the update is monotone —
    a higher-loss domain never gets a smaller weight, strictly larger
    once the excess differs at centi resolution."""
    from multi_threaded_mapreduce_framework_spark.queries.t2_r7 import (
        _EG_WA,
        _EG_WB,
    )

    wa, wb = dict(_EG_WA), dict(_EG_WB)
    # the tables ARE the (micro-rounded) exponential, by construction
    assert wa[0] == wb[0] == 1_000_000
    assert all(wa[a] == round(1e6 * math.exp(-a)) for a in wa)
    rows = QUERIES["q234_doremi_step"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("lang", "text", "n_chars").collect()
    agg: dict[str, list[int]] = {}
    for r in docs:
        a = agg.setdefault(r.lang, [0, 0])
        a[0] += len(r.text.split(" "))
        a[1] += r.n_chars
    assert {r.lang for r in rows} == set(agg)
    max_loss = max(1000 * c // t for t, c in agg.values())

    def ew_micro(loss: int) -> int:
        d_centi = (max_loss - loss) // 10
        return wa.get(d_centi // 100, 0) * wb[d_centi % 100] // 1_000_000

    tot = sum(ew_micro(1000 * c // t) for t, c in agg.values())
    for r in rows:
        toks, chars = agg[r.lang]
        assert r.loss_milli == 1000 * chars // toks
        assert r.weight_micro == 1_000_000 * ew_micro(r.loss_milli) // tot
    total = sum(r.weight_micro for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    by_loss = sorted(rows, key=lambda r: r.loss_milli)
    for a, b in zip(by_loss, by_loss[1:]):
        assert a.weight_micro <= b.weight_micro
        if (max_loss - a.loss_milli) // 10 != (max_loss - b.loss_milli) // 10:
            assert a.weight_micro < b.weight_micro


def test_q235_quantizer_census_vs_python(spark, sf_dir):
    """Exact Python replay of the int8 quantize->dequantize->census
    chain (same IEEE expression order, same floors) plus the
    saturation-bin law: every dimension's min maps to bin 0 and max to
    bin 255, so n_saturated summed over labels is at least 2 per
    non-constant dimension."""
    out = {r.label: r for r in QUERIES["q235_int8_quant_error"](spark, sf_dir).collect()}
    vals: list[tuple[int, int, float]] = []
    for r in load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect():
        for i, x in enumerate(r.embedding):
            vals.append((r.label, i, float(x)))
    mn: dict[int, float] = {}
    mx: dict[int, float] = {}
    for _, i, x in vals:
        mn[i] = min(mn.get(i, x), x)
        mx[i] = max(mx.get(i, x), x)
    census: dict[int, list[int]] = {}
    sat_total = 0
    for lbl, i, x in vals:
        lo, hi = mn[i], mx[i]
        qi = math.floor((x - lo) * 255 / (hi - lo)) if hi > lo else 0
        err = x - (lo + qi * (hi - lo) / 255)
        p12 = math.floor(1e12 * err * err)
        c = census.setdefault(lbl, [0, 0, 0])
        c[0] += 1
        c[1] += p12
        sat = 1 if (qi <= 0 or qi >= 255) else 0
        c[2] += sat
        sat_total += sat
    assert set(out) == set(census)
    for lbl, (n, sse, sat) in census.items():
        r = out[lbl]
        assert (r.n_vals, r.sse_p12, r.n_saturated) == (n, sse, sat)
        assert r.mse_p12 == sse // n
    n_dims = len(mn)
    assert sat_total >= 2 * sum(1 for i in mn if mx[i] > mn[i])
    assert sum(r.n_vals for r in out.values()) == len(vals) and n_dims == 64


def test_q236_cutoff_rank_law(spark, sf_dir):
    """RRF's cutoff law replayed in Python: re-derive the quality
    top-200 ranking independently; verify each fused row's rank_q is
    its list position or exactly 201 when absent (never anything
    else), the fused score is the integer RRF sum, the output is the
    true top-20 of the fused universe, and no row is absent from BOTH
    lists."""
    out = QUERIES["q236_rrf_fusion"](spark, sf_dir).collect()
    assert len(out) == _RRF_TOP
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    qual = []
    for r in docs:
        w = r.text.split(" ")
        chars = len(r.text.replace(" ", ""))
        q = min(1.0, len(w) / 40.0) * 0.6 + min(1.0, (chars / float(len(w))) / 8.0) * 0.4
        qual.append((r.doc_id, q))
    top_q = [d for d, _ in sorted(qual, key=lambda kv: (-kv[1], kv[0]))[:_RRF_L]]
    rank_q = {d: i + 1 for i, d in enumerate(top_q)}
    for r in out:
        assert 1 <= r.rank_q <= _RRF_L + 1 and 1 <= r.rank_i <= _RRF_L + 1
        assert (r.rank_q, r.rank_i) != (_RRF_L + 1, _RRF_L + 1)
        assert r.rank_q == rank_q.get(r.doc_id, _RRF_L + 1)
        assert r.rrf_scaled == 1_000_000 // (_RRF_K + r.rank_q) + 1_000_000 // (
            _RRF_K + r.rank_i
        )
    # the fused head is the true top of the fused universe: recompute
    # the DSIR leg's ranking from the shared scorer and replay fusion
    from multi_threaded_mapreduce_framework_spark.queries.t2_pretrain import (
        dsir_doc_scores,
    )

    imp = [
        (r.doc_id, r.imp_micro)
        for r in dsir_doc_scores(spark, sf_dir)
        .select("doc_id", "imp_micro")
        .collect()
    ]
    top_i = [d for d, _ in sorted(imp, key=lambda kv: (-kv[1], kv[0]))[:_RRF_L]]
    rank_i = {d: i + 1 for i, d in enumerate(top_i)}
    fused = {}
    for d in set(top_q) | set(top_i):
        rq = rank_q.get(d, _RRF_L + 1)
        ri = rank_i.get(d, _RRF_L + 1)
        fused[d] = 1_000_000 // (_RRF_K + rq) + 1_000_000 // (_RRF_K + ri)
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_TOP]
    assert [(r.doc_id, r.rrf_scaled) for r in out] == expect
