"""Laws of functions/portable_math.py — the engine-exact ln that
removed libm from the DSIR gates (q206/q225/q236, r8 verdict item 2).

Three independent implementations of the SAME fixed IEEE expression
tree — the Python mirror, Spark SQL, and DuckDB — must agree
bit-for-bit; and the portable value must sit within ~1e-13 relative of
true libm ln (it replaces ln as a *score*, so it must still BE ln to
far more precision than any downstream micro quantization)."""

from __future__ import annotations

import math

import duckdb
import pytest

from multi_threaded_mapreduce_framework_spark.functions.portable_math import (
    apply_stages_spark,
    apply_stages_sql,
    ln_stages,
    portable_ln_py,
)

# Exercise every interesting regime: tiny k, around power-of-two edges
# (m -> 1 and m -> 2, i.e. z -> 0 and z -> 1/3), mid-range, and the
# top of the bigint domain.
_KS = [
    1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 63, 64, 65, 255, 256, 257,
    999, 1000, 12345, 1_000_003, 2**31 - 1, 2**31, 2**31 + 1,
    2**40 + 12345, 2**52 - 1, 2**62 - 1, 2**62, 2**63 - 1,
]


def test_portable_ln_accuracy_vs_libm():
    for k in _KS:
        truth = math.log(k)
        got = portable_ln_py(k)
        assert abs(got - truth) <= 5e-13 * max(1.0, abs(truth)), (k, got, truth)


def test_portable_ln_duckdb_matches_python_bitwise():
    stages = ln_stages({"lnk": "k"})
    sql = "SELECT k, lnk FROM (" + apply_stages_sql(
        "SELECT k FROM ks", stages
    ) + ")"
    con = duckdb.connect()
    con.execute("CREATE TABLE ks AS SELECT unnest(?::BIGINT[]) AS k", [_KS])
    for k, lnk in con.execute(sql).fetchall():
        assert lnk.hex() == portable_ln_py(k).hex(), k


@pytest.mark.usefixtures("spark")
def test_portable_ln_spark_matches_python_bitwise(spark):
    stages = ln_stages({"lnk": "k"})
    df = spark.createDataFrame([(k,) for k in _KS], "k bigint")
    out = apply_stages_spark(df, stages).select("k", "lnk").collect()
    assert len(out) == len(_KS)
    for r in out:
        assert r.lnk.hex() == portable_ln_py(r.k).hex(), r.k


def test_stage_lists_share_one_expression_text():
    """The Spark and DuckDB sides consume the SAME stage dicts — the
    bit-parity argument rests on the expression trees being the same
    text.  Pin the structural invariants: 4 stages, every non-final
    column prefixed by its output name, and only the portable SQL
    subset (no ln/exp/pow/log tokens) in any expression."""
    stages = ln_stages({"a": "x + 1", "b": "y"})
    assert len(stages) == 4
    assert set(stages[-1]) == {"a", "b"}
    for st in stages:
        for col, expr in st.items():
            low = expr.lower()
            for banned in ("ln(", "exp(", "pow(", "log(", "log2(", "log10("):
                assert banned not in low, (col, banned)


def test_portable_ln_numpy_matches_python_bitwise():
    """The vectorized numpy mirror (the Spark-side hot path since r9)
    must agree bit-for-bit with the scalar Python mirror — and hence
    with the SQL stage form both engines' tests pin above."""
    import numpy as np

    from multi_threaded_mapreduce_framework_spark.functions.portable_math import (
        portable_ln_np,
    )

    got = portable_ln_np(np.array(_KS, dtype=np.int64))
    for k, g in zip(_KS, got):
        assert float(g).hex() == portable_ln_py(k).hex(), k
