"""Portable (engine-exact) transcendental math for oracle-gated queries.

The repo's hash gates compare Spark and DuckDB values bit-for-bit, and
libm transcendentals (``ln``/``exp``/``pow``) are the ONE class of SQL
expression that is implementation-defined: each engine links its own
libm, correct only to ~1 ulp.  Every prior mitigation (round to 4 dp
after the sum, floor at integer-micro) still trusts the two libms to
agree NEAR a lattice boundary.  This module removes libm from the gate
entirely, generalizing the q177 portable-HLL discipline:

**IEEE-754 ``+ - * /`` are correctly-rounded single operations in both
engines**, so a FIXED expression tree over identical double inputs
produces identical bits everywhere.  ``ln`` of a positive *integer*
``k`` therefore becomes portable as:

1. ``e = floor(log2(k))`` — extracted with an integer-comparison CASE
   chain over the 63 powers of two (no floats involved, exact);
2. ``m = k / 2^e  in [1, 2)`` — one exact division (2^e is a power of
   two, the division is exact-ish: correctly rounded, deterministic);
3. ``ln(m) = 2*atanh(z), z = (m-1)/(m+1) in [0, 1/3)`` — a fixed-depth
   Mercator/atanh Horner polynomial (20 odd terms; truncation tail
   < (1/3)^41/41 ≈ 6e-22, far below double resolution);
4. ``ln(k) = ln(m) + e*ln(2)`` — with ``e*ln2`` PRE-COMPUTED in Python
   and emitted as 17-digit literals (decimal literals of ≤17
   significant digits parse to the identical double in both engines).

The result is within ~1e-15 of true ``ln`` — and, what the gate needs,
*byte-identical* across engines, so downstream integer quantization
(``floor(1e6*x + 0.5)``) is boundary-safe: both engines floor the SAME
double.

The expressions are emitted as **stages** (each stage's columns
reference the previous stage's columns by name) so neither engine's
optimizer has to duplicate the CASE chains textually; applying the same
stage list on the Spark side (``select *, expr AS col``) and the DuckDB
side (nested ``SELECT *, expr AS col FROM (...)``) keeps the evaluated
expression TREES identical even if either engine inlines them.  Only
the portable SQL subset appears in stage expressions: CASE/CAST/
COALESCE and ``+ - * / %`` — valid verbatim in Spark SQL and DuckDB.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

LN2 = math.log(2.0)

# Odd-term count of the atanh series; z < 1/3 so the truncation tail
# (1/3)^(2N+1)/(2N+1) at N=20 is ~6e-22 — below 1 ulp of any ln value.
_N_TERMS = 20


def _dlit(v: float) -> str:
    """Emit ``v`` as a DOUBLE literal that parses to the identical
    double in both engines.  Scientific notation is load-bearing: a
    bare decimal literal (``2.772588722239781``) is typed DECIMAL by
    both Spark and DuckDB, and DuckDB's CASE-branch type unification
    then coerces all branches to one decimal scale — silently dropping
    the last digit of some branches (observed: a 1-ulp flip at k=16).
    ``1.23e0`` notation is typed DOUBLE directly, and 17 significant
    digits round-trip every double exactly under both engines'
    correctly-rounded parsers."""
    return f"{v:.17e}"


def _e_case(k: str, lit) -> str:
    """CASE chain extracting, for integer SQL expr ``k`` >= 1, a literal
    keyed by e = floor(log2(k)) — ``lit(e)`` renders the THEN value."""
    whens = " ".join(
        f"WHEN ({k}) >= {1 << e} THEN {lit(e)}" for e in range(62, 0, -1)
    )
    return f"(CASE {whens} ELSE {lit(0)} END)"


def _horner(z2: str) -> str:
    """Fixed-order Horner form of sum_{n>=0} z2^n / (2n+1), referencing
    the column ``z2`` once per term (identical tree both engines)."""
    poly = _dlit(1.0 / (2 * _N_TERMS - 1))
    for n in range(_N_TERMS - 2, -1, -1):
        c = _dlit(1.0 / (2 * n + 1)) if n else _dlit(1.0)
        poly = f"({c} + {z2} * {poly})"
    return poly


def ln_stages(ks: dict[str, str]) -> list[dict[str, str]]:
    """Stage list computing portable ``ln`` for each ``out_col -> k_sql``
    (k integer-valued, >= 1).  Returns 4 stages of {col: sql_expr};
    intermediate columns are prefixed ``out_col + '_'`` and left on the
    relation (drop or project them away afterwards)."""
    s1: dict[str, str] = {}
    s2: dict[str, str] = {}
    s3: dict[str, str] = {}
    s4: dict[str, str] = {}
    for out, k in ks.items():
        s1[f"{out}_eln2"] = _e_case(k, lambda e: _dlit(e * LN2))
        s1[f"{out}_m"] = (
            f"(CAST(({k}) AS DOUBLE) / "
            f"{_e_case(k, lambda e: _dlit(float(1 << e)))})"
        )
        s2[f"{out}_z"] = (
            f"(({out}_m - {_dlit(1.0)}) / ({out}_m + {_dlit(1.0)}))"
        )
        s3[f"{out}_z2"] = f"({out}_z * {out}_z)"
        s4[out] = (
            f"({out}_eln2 + {_dlit(2.0)} * {out}_z"
            f" * {_horner(f'{out}_z2')})"
        )
    return [s1, s2, s3, s4]


def apply_stages_spark(df, stages: list[dict[str, str]]):
    """Apply a stage list on the Spark side (one projection per stage)."""
    for st in stages:
        df = df.select("*", *[F.expr(e).alias(c) for c, e in st.items()])
    return df


def apply_stages_sql(base_sql: str, stages: list[dict[str, str]]) -> str:
    """Wrap ``base_sql`` in one nested SELECT per stage (DuckDB side)."""
    q = base_sql
    for st in stages:
        cols = ", ".join(f"{e} AS {c}" for c, e in st.items())
        q = f"SELECT *, {cols} FROM ({q})"
    return q


def portable_ln_np(kv):
    """Vectorized numpy mirror of the portable ln — bit-identical to the
    SQL stage form (law-tested over the bigint domain edges), because
    every step is the same sequence of IEEE operations: exact integer
    log2 via shift loops, exact division by 2^e, the same Horner
    order, and ``e * LN2`` (a float multiply of the exact integer e —
    the same double the stage form embeds as a 17-digit literal, which
    round-trips by construction).  numpy ufuncs are plain IEEE ops (no
    FMA contraction), so elementwise evaluation matches scalar
    evaluation bitwise.

    This is the SPARK-side evaluation path for hot queries: the staged
    CASE-chain SQL form is semantically identical but its ~500-node
    expression trees cost the optimizer/codegen ~2 s of fixed planning
    overhead per action (measured on q206) — an Arrow-batched kernel
    over the vocab-bounded relation evaluates the same math with a
    one-node plan.  The SQL stage form remains the ORACLE-side (DuckDB)
    evaluation and the cross-engine parity reference."""
    import numpy as np

    kv = np.asarray(kv, dtype=np.int64)
    e = np.zeros(len(kv), dtype=np.int64)
    tmp = kv.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = tmp >= (np.int64(1) << shift)
        e[m] += shift
        tmp[m] >>= shift
    mm = kv.astype(np.float64) / np.ldexp(1.0, e)
    z = (mm - 1.0) / (mm + 1.0)
    z2 = z * z
    poly = np.full(len(kv), 1.0 / (2 * _N_TERMS - 1))
    for n in range(_N_TERMS - 2, -1, -1):
        poly = (1.0 / (2 * n + 1) if n else 1.0) + z2 * poly
    return e * LN2 + 2.0 * z * poly


def portable_ln_py(k: int) -> float:
    """Python mirror of the portable ln (for law tests): same range
    reduction, same Horner depth, same literal e*ln2 — reproduces the
    engines' value bit-for-bit under IEEE double arithmetic."""
    assert k >= 1
    e = k.bit_length() - 1
    m = float(k) / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    poly = 1.0 / (2 * _N_TERMS - 1)
    for n in range(_N_TERMS - 2, -1, -1):
        poly = (1.0 / (2 * n + 1) if n else 1.0) + z2 * poly
    return e * LN2 + 2.0 * z * poly
