"""Custom aggregates via Arrow grouped-agg pandas UDFs.

The reference's reduce phase is the general "fold a whole group"
contract (MapReduceClient.h:62-64); Spark's native aggregates cover the
algebraic cases, and a GROUPED_AGG pandas UDF is the Arrow-batched
escape hatch for aggregates Spark lacks — the whole group's column
arrives as one pandas Series, one result scalar goes back. Unlike
``applyInPandas`` (full-DataFrame-per-group), a grouped-agg UDF slots
into a normal ``agg()`` call — though Spark refuses to MIX it with JVM
aggregates in the same ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT): run
the two aggregates separately and join on the group key, which stays
one shuffle since both sides hash-partition identically.

Scale note: grouped-agg UDFs do NOT do map-side partial aggregation —
the whole group's values shuffle to one task (exactly the reference's
semantics, and the reason the engine prefers JVM decomposable
aggregates everywhere else). Use for moderate group sizes or after a
pre-aggregation; `tests/test_grouped_agg.py` pins parity with the JVM
percentile path.
"""

# NO `from __future__ import annotations` here: pandas_udf infers
# GROUPED_AGG from the (Series -> scalar) signature, and stringified
# annotations break that inference.
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_iqr_udf():
    """Interquartile range (p75 - p25, linear interpolation — the same
    definition as ``percentile(x, 0.75) - percentile(x, 0.25)``).
    Built as a factory so the inner function pickles by value (tests
    import this module; cloudpickle would otherwise reference it)."""

    @pandas_udf("double")
    def iqr(v: pd.Series) -> float:
        return float(v.quantile(0.75) - v.quantile(0.25))

    return iqr
