"""Law-pinning tests for the round-6 close tiers (q198-q204):
boundary semantics and cross-path invariants the DuckDB value-hash
alone can't pin — the session_window merge-at-exactly-gap law, the
unpivot Expand shape, recursive-CTE-vs-pointer-jumping parity on one
forest, variant null/missing-path behavior, row-level XML roundtrip
identity, delta-greedy trajectory parity, and the sequence-packing
boundary law."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries import all_queries

QUERIES = all_queries()
SF = "/root/testdata/sf0.001"


def test_q199_session_window_merges_at_exactly_gap(spark):
    """The declared law: a new session starts only when the gap is
    STRICTLY greater than the threshold.  Events exactly 30 minutes
    apart must merge (windows [t, t+g) and [t+g, ...) coalesce); one
    microsecond beyond must split."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=30)),            # merges
        (2, t0),
        (2, t0 + datetime.timedelta(minutes=30, microseconds=1)),  # splits
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        r.user_id: r["count"]
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("count"))
        .collect()
    }
    assert got == {1: 1, 2: 2}


def test_q199_matches_q23_session_counts(spark):
    """q199's native session_window and q23's manual gaps-and-islands
    declare the same '> gap' law — their per-user session counts must
    agree exactly on the real fixture."""
    native = {
        r.user_id: r.n_sessions
        for r in QUERIES["q199_session_window_native"].builder(spark, SF).collect()
    }
    manual = {
        r.user_id: r.num_sessions
        for r in QUERIES["q23_sessionize"].builder(spark, SF).collect()
    }
    assert native == manual


def test_q198_unpivot_is_expand_not_union(spark):
    """unpivot must plan as ONE Expand over the aggregate, not N
    re-scans union-ed (the oracle's formulation): exactly one Scan in
    the physical plan and an Expand node."""
    df = QUERIES["q198_unpivot_doc_metrics"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    # and the long rows cover every (lang, metric) cell of the wide table
    rows = df.collect()
    langs = {r.lang for r in rows}
    per_lang = {m for r in rows if r.lang == next(iter(langs)) for m in [r.metric]}
    assert per_lang == {"n_docs", "sum_chars", "n_sources", "max_chars"}
    assert len(rows) == 4 * len(langs)


def test_q200_recursive_cte_agrees_with_pointer_jumping(spark):
    """One forest law, two Spark evaluation strategies: the depth
    census from the recursive CTE must equal the census computed from
    q175's pointer-jumping depths."""
    cte = {
        r.depth: (r.n_nodes, r.sum_custkey)
        for r in QUERIES["q200_recursive_cte_depths"].builder(spark, SF).collect()
    }
    pj = {
        r.depth: (r.n_nodes, r.sum_custkey)
        for r in QUERIES["q175_tree_depth_pointer_jumping"]
        .builder(spark, SF)
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("custkey").cast("bigint").alias("sum_custkey"),
        )
        .collect()
    }
    assert cte == pj


def test_q201_variant_missing_path_is_null(spark):
    """variant_get on a missing path must yield NULL (not error, not
    zero) so the census's null bucket is well-defined; a non-integer
    value at the path under a 'bigint' cast must also surface as a
    typed read, never a silent wrong number."""
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"other": 1}',), ("{}",)], "props string"
    )
    got = df.select(
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k")
    ).collect()
    assert [r.k for r in got] == [7, None, None]


def test_q202_xml_roundtrip_identity_rowlevel(spark):
    """Stronger than the census hash: EVERY row's (event_id,
    event_type, value_micro) triple must survive to_xml -> from_xml
    bit-exactly — zero mismatched rows on the real fixture."""
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    xml = F.expr(
        "to_xml(named_struct("
        "'event_id', event_id, "
        "'event_type', event_type, "
        "'value_micro', CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)))"
    )
    parsed = F.from_xml(
        xml, "event_id BIGINT, event_type STRING, value_micro BIGINT"
    )
    bad = (
        ev.select(
            "event_id",
            "event_type",
            F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").alias(
                "vm"
            ),
            parsed.alias("p"),
        )
        .filter(
            (F.col("p.event_id") != F.col("event_id"))
            | (F.col("p.event_type") != F.col("event_type"))
            | (F.col("p.value_micro") != F.col("vm"))
            | F.col("p.event_id").isNull()
        )
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_GAP_US = 30 * 60 * 1_000_000
# offsets in multiples of 10 minutes plus exact-gap edge values, so
# exactly-30-min gaps (the merge boundary) occur often
_offsets = st.lists(
    st.integers(min_value=0, max_value=24).map(lambda k: k * 600_000_000)
    | st.sampled_from([_GAP_US, _GAP_US + 1, _GAP_US - 1]),
    min_size=1,
    max_size=12,
)


def _islands(us_sorted):
    """Independent Python reference: number of sessions and summed
    duration under the declared law (new session iff gap > threshold;
    duration = last - first + gap per session)."""
    sessions = []
    for u in us_sorted:
        if sessions and u - sessions[-1][1] <= _GAP_US:
            sessions[-1][1] = u
        else:
            sessions.append([u, u])
    return len(sessions), sum(b - a + _GAP_US for a, b in sessions)


@given(offs=_offsets)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_q199_session_window_law_randomized(spark, offs):
    """session_window must realize the islands law on ARBITRARY event
    sets, including duplicate timestamps and exactly-gap edges — the
    single-example boundary test generalized."""
    import datetime

    base = datetime.datetime(2024, 3, 1)
    # cumulative offsets so later events never precede earlier ones;
    # duplicates arise when an offset is 0
    us, acc = [], 0
    for o in offs:
        acc += o
        us.append(acc)
    rows = [(1, base + datetime.timedelta(microseconds=u)) for u in us]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.unix_micros(F.col("session_window.end"))
                - F.unix_micros(F.col("session_window.start"))
            ).alias("dur"),
        )
        .collect()[0]
    )
    n_ref, dur_ref = _islands(sorted(us))
    assert (got.n, got.dur) == (n_ref, dur_ref)


def test_q203_picks_identical_to_naive_full_recount(spark):
    """Delta-maintained greedy must reproduce the naive full-recount
    trajectory exactly — same winners, same marginal gains, same
    rounds — on the real fixture.  The naive loop lives HERE (it was
    q174's builder until the r7 delegation, VERDICT r06 item 3): each
    round recounts every remaining document's gain against the
    shrinking uncovered universe, which is the textbook lazy-greedy
    definition and shares no code with q203's delta engine."""
    import pyspark.sql.functions as F

    from multi_threaded_mapreduce_framework_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    sh = F.expr(
        "array_distinct(transform(slice(ws, 1, greatest(size(ws) - 2, 0)),"
        " (w, i) -> concat_ws(' ', slice(ws, i + 1, 3))))"
    )
    ds = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(sh).alias("sh"))
        .localCheckpoint()
    )
    remaining = ds
    naive = []
    for rnd in (1, 2, 3):
        top = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()[0]
        )
        naive.append((rnd, top.doc_id, top.gain))
        if rnd < 3:
            won_sh = (
                ds.filter(F.col("doc_id") == top.doc_id).select("sh").distinct()
            )
            remaining = remaining.filter(F.col("doc_id") != top.doc_id).join(
                F.broadcast(won_sh), "sh", "left_anti"
            )
    b = sorted(
        (r.round, r.doc_id, r.gain)
        for r in QUERIES["q203_incremental_greedy_coverage"]
        .builder(spark, SF)
        .collect()
    )
    assert sorted(naive) == b
    # ...and q174's delegating builder returns the same trajectory
    a = sorted(
        (r.round, r.doc_id, r.gain)
        for r in QUERIES["q174_greedy_coverage"].builder(spark, SF).collect()
    )
    assert a == b


def test_q203_early_stop_on_exhausted_coverage(spark, tmp_path):
    """When coverage exhausts before K picks, zero-gain docs must NOT
    be picked (they leave the gains table): the q174 known-optimum
    corpus yields exactly 2 picks at k=3 — doc2 (8 shingles), doc1
    (4 disjoint), and doc0 (subset of doc2) never appears."""
    rows = [
        (0, "a b c d e f g h"),
        (1, "p q r s t u"),
        (2, "a b c d e f g h i j"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.round: (r.doc_id, r.gain)
        for r in QUERIES["q203_incremental_greedy_coverage"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: (2, 8), 2: (1, 4)}


def test_q204_packing_boundary_law(spark, tmp_path):
    """Hand-computable packing: with L=256, a doc ending EXACTLY on a
    sequence boundary is not split; one token further is.  Corpus:
    100 + 156 tokens fill sequence 0 exactly (no split), 50 more open
    sequence 1 (last fill 50); swapping the middle doc to 157 tokens
    pushes its last token into sequence 1 — one split doc."""
    def txt(n):
        return " ".join(["w"] * n)

    for mid, want in (
        (156, {"n_docs": 3, "total_tokens": 306, "n_seqs": 2,
               "n_split_docs": 0, "last_seq_fill": 50}),
        (157, {"n_docs": 3, "total_tokens": 307, "n_seqs": 2,
               "n_split_docs": 1, "last_seq_fill": 51}),
    ):
        rows = [(1, txt(100), "en"), (2, txt(mid), "en"), (3, txt(50), "en")]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        got = (
            QUERIES["q204_sequence_packing"]
            .builder(spark, str(tmp_path))
            .collect()[0]
            .asDict()
        )
        got.pop("lang")
        assert got == want, mid
