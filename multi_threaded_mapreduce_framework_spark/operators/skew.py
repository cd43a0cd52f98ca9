"""Skew mitigation operators.

AQE handles skewed *joins* (``spark.sql.adaptive.skewJoin``) by
splitting oversized shuffle partitions, but a single hot aggregation
key still lands on one reducer. Salted two-phase aggregation spreads a
hot key over N sub-keys: partial-aggregate on (key, salt), then final
aggregate on key — the shuffle carries at most N rows per hot key per
map partition instead of every row.

Associative/commutative aggregates only (sum/count/min/max) — exactly
the algebraic class where Spark already applies map-side combine; this
adds the *reducer-side* spreading for keys whose combined row count
still overwhelms one task at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salt_column(df: DataFrame, n_salts: int) -> F.Column:
    """The salt expression used by :func:`salted_agg`: partition id
    mixed with a row hash, mod ``n_salts``. Exposed so tests (and
    custom two-phase aggregations) can assert its spreading behavior."""
    return F.pmod(F.hash(F.spark_partition_id(), *df.columns), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name -> "fn(col)" where fn is one of
    sum/count/min/max (algebraic, so phase-2 re-aggregation is exact:
    count re-aggregates as sum of partial counts).

    The salt mixes ``spark_partition_id()`` with a hash of the row's
    columns: byte-identical duplicate rows (the most common hot-key
    shape) land in different input partitions and therefore spread
    across salts, while a pure row-hash salt would send every duplicate
    to one reducer — defeating the point. Still deterministic for a
    fixed partition layout, so retries of a task produce identical
    partials.
    """
    salted = df.withColumn(SALT_COL, salt_column(df, n_salts))

    phase1, phase2 = [], []
    for out_name, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"non-algebraic aggregate: {spec}")
        phase1.append(getattr(F, fn)(F.lit(1) if col == "*" else col).alias(out_name))
        refn = "sum" if fn in ("sum", "count") else fn
        phase2.append(getattr(F, refn)(out_name).alias(out_name))

    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)
