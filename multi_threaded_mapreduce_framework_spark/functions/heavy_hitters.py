"""Bounded-memory heavy-hitter candidates: per-partition Misra-Gries.

The scale problem: finding items above a support threshold with a
plain ``groupBy(key).count()`` shuffles the ENTIRE key domain — for
high-cardinality keys (shingles, n-grams, URLs) the tail dominates the
shuffle even though only the head is wanted.  Misra-Gries keeps at
most ``k`` counters per partition and guarantees every item whose
partition count exceeds ``n_p / (k+1)`` survives; summed over
partitions (pigeonhole), every item with GLOBAL count > N/(k+1)
appears in at least one partition's candidate set.  The exact recount
of the (bounded, broadcastable) candidate union then removes all false
positives — so the final answer is EXACT, while only candidate keys
ever shuffle.

This runs as ``mapInPandas`` so the sketch lives inside the scan stage
(no shuffle before it); batches arrive via Arrow and are folded with
vectorized ``value_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Return a DataFrame of at most ``k * numPartitions`` candidate
    values of ``df[col]`` guaranteed to include every value with global
    count > N/(k+1) (N = total rows).  Output column name == ``col``."""
    import pandas as pd  # noqa: F401 (worker-side)

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # exact within the batch, then MG-prune the merged dict
            for val, c in pdf[col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everything;
                # items <= it drop — the canonical mergeable MG step
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        yield pd.DataFrame({col: list(counters.keys())}).astype({col: "object"})

    return df.select(col).mapInPandas(summarize, schema=f"{col} string")
