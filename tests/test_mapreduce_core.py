"""The reference's own golden test, automated (SURVEY.md §5.1):
the sample client's parallel character count over three fixed strings
(reference ``Sample Client/SampleClient.cpp:69-111``), run through the
``run_mapreduce`` client-contract adapter, checked order-insensitively
(output is an unordered bag, ``MapReduceFramework.cpp:368-369``).

All map/reduce callables are defined *inside* the tests: cloudpickle
then serializes them by value, so Spark's Python workers never need the
test module importable.
"""

from __future__ import annotations

from collections import Counter

import pytest

from multi_threaded_mapreduce_framework_spark.operators import (
    Stage,
    run_mapreduce,
    run_mapreduce_arrow,
    start_mapreduce_job,
)

# The reference sample client's exact inputs (SampleClient.cpp:74-79).
SAMPLE_STRINGS = [
    "This string is full of characters",
    "Multithreading is awesome",
    "conditions are race bad",
]


def expected_char_counts(strings):
    c = Counter()
    for s in strings:
        c.update(s)
    return dict(c)


def _char_fns():
    def char_map(row):
        return [(ch, 1) for ch in row.text]

    def char_reduce(key, values):
        return [(key, sum(values))]

    return char_map, char_reduce


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(s,) for s in SAMPLE_STRINGS], "text string")


def test_sample_client_golden(spark, sample_df):
    char_map, char_reduce = _char_fns()
    out = run_mapreduce(sample_df, char_map, char_reduce, "k3 string, v3 long")
    got = {r.k3: r.v3 for r in out.collect()}
    assert got == expected_char_counts(SAMPLE_STRINGS)


def test_map_is_flatmap_zero_emits(spark, sample_df):
    # map may emit 0 pairs for an input (MapReduceClient.h:57-59)
    def only_spaces(row):
        return [(ch, 1) for ch in row.text if ch == " "]

    _, char_reduce = _char_fns()
    out = run_mapreduce(sample_df, only_spaces, char_reduce, "k3 string, v3 long")
    got = {r.k3: r.v3 for r in out.collect()}
    assert got == {" ": expected_char_counts(SAMPLE_STRINGS)[" "]}


def test_reduce_is_flatmap_multi_emit(spark, sample_df):
    # reduce may emit 0..n pairs per group (MapReduceClient.h:62-64)
    def dup_reduce(key, values):
        return [(key, sum(values)), (key + "!", sum(values))]

    char_map, _ = _char_fns()
    out = run_mapreduce(sample_df, char_map, dup_reduce, "k3 string, v3 long")
    rows = out.collect()
    exp = expected_char_counts(SAMPLE_STRINGS)
    assert len(rows) == 2 * len(exp)
    assert {r.k3: r.v3 for r in rows if not r.k3.endswith("!")} == exp


def test_groups_are_multisets(spark):
    # duplicate (k, v) pairs are preserved (MapReduceFramework.cpp:198-201)
    df = spark.createDataFrame([("a",), ("a",), ("a",)], "text string")
    out = run_mapreduce(
        df,
        lambda row: [(row.text, 1)],
        lambda k, vs: [(k, len(vs))],
        "k3 string, v3 long",
    )
    assert {(r.k3, r.v3) for r in out.collect()} == {("a", 3)}


def test_empty_input_short_circuit(spark):
    # empty input -> empty bag (MapReduceFramework.cpp:256-261)
    char_map, char_reduce = _char_fns()
    df = spark.createDataFrame([], "text string")
    out = run_mapreduce(df, char_map, char_reduce, "k3 string, v3 long")
    assert out.count() == 0


def test_async_job_handle(spark, sample_df):
    char_map, char_reduce = _char_fns()
    handle = start_mapreduce_job(sample_df, char_map, char_reduce)
    state = handle.get_job_state()  # poll while (possibly) running
    assert state.stage in (Stage.UNDEFINED, Stage.MAP, Stage.SHUFFLE, Stage.REDUCE)
    assert 0.0 <= state.percentage <= 100.0
    handle.wait()
    handle.wait()  # join-once semantics: second wait is a no-op
    got = {r.k3: r.v3 for r in handle.result()}
    assert got == expected_char_counts(SAMPLE_STRINGS)
    done = handle.get_job_state()
    assert done.stage is Stage.REDUCE and done.percentage == 100.0
    handle.close()


def test_arrow_fast_path_parity(spark, sample_df):
    """Arrow path computes the same bag as the exact-semantics path."""

    def map_batches(batches):
        import pandas as pd

        for pdf in batches:
            chars = pdf["text"].map(list).explode()
            chars = chars[chars.notna()]
            yield pd.DataFrame({"k2": chars, "v2": 1})

    def reduce_group(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"k3": [pdf["k2"].iloc[0]], "v3": [int(pdf["v2"].sum())]}
        )

    out = run_mapreduce_arrow(
        sample_df,
        map_batches,
        reduce_group,
        intermediate_schema="k2 string, v2 long",
        output_schema="k3 string, v3 long",
        key_cols=("k2",),
    )
    got = {r.k3: r.v3 for r in out.collect()}
    assert got == expected_char_counts(SAMPLE_STRINGS)


def test_job_handle_error_surfaces(spark, sample_df):
    # reference kills the process on worker error (MapReduceFramework.cpp
    # :241-247); this engine surfaces the exception from result() instead
    def bad_map(row):
        raise ValueError("boom in map")

    _, char_reduce = _char_fns()
    handle = start_mapreduce_job(sample_df, bad_map, char_reduce)
    handle.wait()
    import pytest as _pytest

    with _pytest.raises(Exception, match="boom in map"):
        handle.result()


def test_run_mapreduce_partition_override(spark, sample_df):
    char_map, char_reduce = _char_fns()
    out = run_mapreduce(
        sample_df, char_map, char_reduce, "k3 string, v3 long", num_partitions=2
    )
    got = {r.k3: r.v3 for r in out.collect()}
    assert got == expected_char_counts(SAMPLE_STRINGS)
