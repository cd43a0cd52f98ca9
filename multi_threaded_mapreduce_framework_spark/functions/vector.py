"""Vector math as JVM-side column expressions.

Everything here stays inside whole-stage codegen (``F.zip_with`` /
``F.aggregate`` higher-order functions) — no Python UDF on the hot path.
All math is done in DOUBLE regardless of the stored element type so
results are reproducible across engines (the fixture embeddings are
float32; float accumulation order would otherwise make scores
engine-dependent at the 4th decimal).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_double_array(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    """Dot product of two array columns (computed in double)."""
    prods = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    arr = _as_double_array(a)
    sq = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a, b) -> Column:
    """Cosine similarity sum(ab)/sqrt(sum(a^2)*sum(b^2)) — the same
    formula DuckDB's list_cosine_similarity uses, for oracle parity."""
    arr_a, arr_b = _as_double_array(a), _as_double_array(b)
    num = dot(arr_a, arr_b)
    den_sq = F.aggregate(
        arr_a, F.lit(0.0), lambda acc, x: acc + x * x
    ) * F.aggregate(arr_b, F.lit(0.0), lambda acc, x: acc + x * x)
    return num / F.sqrt(den_sq)
