"""Every declared query runs end-to-end at sf0.001 with a stable schema.

Value-level correctness is the DuckDB oracle gate
(``tools/check_oracle.py`` locally, the driver's CORRECTNESS check in
CI); this suite asserts the full inventory *executes* and keeps its
declared column contract, so a refactor can't silently drop a query.
"""

from __future__ import annotations

import pytest

from multi_threaded_mapreduce_framework_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.builder(spark, sf_dir)
    cols = df.columns
    assert cols, f"{name} returned no columns"
    assert len(set(cols)) == len(cols), f"{name} has duplicate column names"
    n = df.count()
    assert n >= 0


def test_oracle_sql_declared_for_sql_expressible():
    # every query either declares an oracle or is explicitly rows-only
    for name, q in QUERIES.items():
        assert q.oracle is None or "SELECT" in q.oracle.upper(), name


def test_parity_wordcount_mapreduce_vs_dataframe(spark, sf_dir):
    """q01 computed through the client-contract adapter must hash-match
    the native DataFrame plan (internal oracle, SURVEY.md §5.2)."""
    from multi_threaded_mapreduce_framework_spark.operators import run_mapreduce
    from multi_threaded_mapreduce_framework_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    mr = run_mapreduce(
        docs,
        lambda row: [(w, 1) for w in row.text.split(" ")],
        lambda k, vs: [(k, sum(vs))],
        "word string, cnt long",
    )
    native = QUERIES["q01_wordcount"].builder(spark, sf_dir)
    assert {(r.word, r.cnt) for r in mr.collect()} == {
        (r.word, r.cnt) for r in native.collect()
    }


def test_q94_raises_on_exhausted_iterations(spark, sf_dir):
    """The label-propagation loop must never silently return
    unconverged cluster ids: with max_iters=1 (any graph with >= 1 edge
    needs >= 2 rounds — one to propagate, one to observe zero changes)
    the builder raises instead of returning wrong labels."""
    import pytest as _pytest

    from multi_threaded_mapreduce_framework_spark.queries.t2_cluster import (
        q94_dedup_clusters,
    )

    with _pytest.raises(RuntimeError, match="did not converge"):
        q94_dedup_clusters(spark, sf_dir, max_iters=1).collect()


def test_driver_priority_names_all_registered():
    """A typo in _DRIVER_PRIORITY silently drops that query from the
    front of the driver-check rotation — pin every name to a real
    registration, and the rotation front to the round-4 debut band."""
    from multi_threaded_mapreduce_framework_spark.queries.registry import (
        _DRIVER_PRIORITY,
    )

    reg = set(all_queries())
    missing = [n for n in _DRIVER_PRIORITY if n not in reg]
    assert missing == [], missing
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)  # no dupes
    ordered = list(all_queries())
    num = lambda n: int(n[1:].split("_", 1)[0])  # noqa: E731
    # round-10 rotation (VERDICT r09 item 1): this round's debuts lead
    # the window (never driven; ascending numeric order)...
    n_new_debuts = 6  # q267-q272; bump as round-10 queries land
    debut_nums = [num(n) for n in ordered[:n_new_debuts]]
    assert debut_nums == sorted(debut_nums) and all(
        x >= 267 for x in debut_nums
    ), ordered[:n_new_debuts]
    assert ordered[0] == "q267_image_resize_census"
    # ...then the 20 names last driven r04 — the oldest stale band the
    # r9 verdict names — staleness-first...
    stale = ordered[n_new_debuts : n_new_debuts + 20]
    assert {num(n) for n in stale} == {
        23, 24, 127, 130, 132, 144, 145, 147, 148, 149, 150, 151, 153,
        158, 162, 163, 164, 165, 166, 171,
    }, sorted(num(n) for n in stale)
    # ...then the window's remaining 24 slots retire the OLDEST r05
    # rows (the 23-row tail defers with per-row rationale in
    # registry.py — q53/q54/q55/q64-q66/q72-q75/q86/q87/q89-q93/q25/
    # q107/q108/q109/q110/q172 are the deferred set)
    r05 = ordered[n_new_debuts + 20 : n_new_debuts + 20 + 24]
    assert {num(n) for n in r05} == {
        26, 27, 28, 57, 58, 59, 60, 61, 62, 63, 68, 69, 70, 71, 95, 96,
        97, 99, 100, 101, 103, 104, 105, 106,
    }, sorted(num(n) for n in r05)


def test_every_query_has_a_survey_inventory_row():
    """SURVEY.md §2.3 is the judge-facing coverage contract: a query
    registered here but missing there is invisible coverage, and a
    SURVEY row without a registration is a false claim. Keep the
    registry and the inventory in lockstep (names are backticked in the
    table's first column)."""
    import os
    import re

    survey = open(
        os.path.join(os.path.dirname(__file__), os.pardir, "SURVEY.md"),
        encoding="utf-8",
    ).read()
    declared = set(re.findall(r"^\| `(q\d+_[a-z0-9_]+)` \|", survey, re.M))
    registered = set(QUERIES)
    missing_rows = sorted(registered - declared)
    phantom_rows = sorted(declared - registered)
    assert missing_rows == [], f"registered but not in SURVEY §2.3: {missing_rows}"
    assert phantom_rows == [], f"in SURVEY §2.3 but not registered: {phantom_rows}"
