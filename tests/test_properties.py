"""Property-based invariants of the MapReduce shuffle (SURVEY.md §5.2).

The reference's shuffle guarantees (``MapReduceFramework.cpp:191-210``):
every intermediate pair lands in exactly one group; group membership is
key-equality; groups are multisets. Expressed as randomized invariants:

- sum of per-group counts == total intermediate pairs emitted;
- union of groups == multiset of emitted pairs;
- grouped reduce of (+) == global per-key sums computed in pure Python.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multi_threaded_mapreduce_framework_spark.operators import run_mapreduce

keys = st.sampled_from(["a", "b", "c", "d", "e"])
rows = st.lists(
    st.tuples(keys, st.integers(min_value=-1000, max_value=1000)),
    min_size=0,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=12,  # each example launches Spark jobs; keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@_SETTINGS
def test_group_sum_invariant(spark, data):
    df = spark.createDataFrame(data or [], "k string, v long")
    out = run_mapreduce(
        df,
        lambda row: [(row.k, row.v)],
        lambda k, vs: [(k, sum(vs))],
        "k3 string, v3 long",
    )
    got = {r.k3: r.v3 for r in out.collect()}
    exp = {}
    for k, v in data:
        exp[k] = exp.get(k, 0) + v
    assert got == exp


@given(data=rows)
@_SETTINGS
def test_shuffle_preserves_multiset(spark, data):
    df = spark.createDataFrame(data or [], "k string, v long")
    # identity reduce: re-emit every pair in the group
    out = run_mapreduce(
        df,
        lambda row: [(row.k, row.v)],
        lambda k, vs: [(k, v) for v in vs],
        "k3 string, v3 long",
    )
    assert Counter((r.k3, r.v3) for r in out.collect()) == Counter(data)
