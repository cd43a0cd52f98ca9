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


# ------------------------------------------------- bitmap word algebra
ids = st.lists(
    st.integers(min_value=-5000, max_value=5000), min_size=0, max_size=60
)


@given(data=ids)
@_SETTINGS
def test_bitmap_word_distinct_count_invariant(spark, data):
    """q153's word packing (shiftright 6 / pmod 64 / bit_or) counts
    exactly |set(ids)| for ANY int64 ids, including negatives (the
    floor-vs-truncate pairing the shiftright fix exists for)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i,) for i in data] or [], "user_id long")
    words = df.groupBy(F.expr("shiftright(user_id, 6)").alias("wi")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT)))"
        ).alias("w")
    )
    row = words.agg(F.sum(F.expr("bit_count(w)")).alias("n")).first()
    assert (row["n"] or 0) == len(set(data))


# ------------------------------------- deletion-neighborhood recall
tokens = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5), min_size=0, max_size=12
)


@given(data=tokens)
@_SETTINGS
def test_deletion_neighborhood_finds_all_lev1_pairs(spark, data):
    """q155's in-row variant expansion + equi-join + levenshtein verify
    == brute-force edit-distance-1 pairs for arbitrary short strings
    (FastSS recall/precision on adversarial hypothesis inputs:
    duplicates, shared prefixes, length-1 and EMPTY strings)."""
    import pyspark.sql.functions as F

    names = sorted(set(data))
    df = spark.createDataFrame([(n,) for n in names] or [], "name string")
    variants = df.select(
        "name",
        F.explode(
            F.expr(
                "array_union(array(name), transform(sequence(1, length(name)),"
                " i -> concat(substring(name, 1, i - 1),"
                " substring(name, i + 1, length(name)))))"
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    got = {
        (r.n1, r.n2)
        for r in a.join(
            b, (F.col("a.v") == F.col("b.v")) & (F.col("a.name") < F.col("b.name"))
        )
        .select(F.col("a.name").alias("n1"), F.col("b.name").alias("n2"))
        .distinct()
        .filter(F.levenshtein("n1", "n2") == 1)
        .collect()
    }

    def lev(x, y):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (x[i - 1] != y[j - 1]),
            )

        return d(len(x), len(y))

    want = {
        (x, y)
        for i, x in enumerate(names)
        for y in names[i + 1 :]
        if lev(x, y) == 1
    }
    assert got == want
