"""Portable Bloom-filter runtime join filter, built entirely from
public Spark SQL primitives (``xxhash64`` + bitwise aggregates).

Spark's own ``bloom_filter_agg`` / ``might_contain`` pair exists in the
optimizer (runtime row-level filtering) but is not registered in the
public function registry on every build, and the optimizer only injects
it under size heuristics it controls.  This module makes the pattern an
explicit, declarable operator — the lake-scale analogue of the
reference pre-filtering a worker's shard before the expensive phase
(the reference's map stage reads only its own pre-split shard,
``MapReduceFramework.cpp`` job setup):

1. BUILD: hash every build-side key k times (``xxhash64(key, i)``),
   fold the bit positions into ``m/64`` 64-bit words with a ``bit_or``
   aggregate — a domain-bounded shuffle of at most ``m/64`` rows,
   independent of build-side row count.
2. SHIP: the word table collapses to ONE row holding an
   ``array<long>`` of fixed size ``m/64`` (bounded driver/broadcast
   cost — like an IVF centroid table, NOT like collecting the keys).
3. PROBE: a pure map-side expression tests all k bits against the
   broadcast array.  False positives pass (and must be removed by the
   exact join that follows); false negatives cannot happen, so the
   prefilter never changes the final result — it only shrinks the rows
   entering the shuffle.

At 100 TB the probe side never shuffles rows whose key cannot be in
the build side; the filter itself costs k hashes per row, JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bloom_build(df: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """Aggregate the build side into a 1-row DataFrame with column
    ``bloom`` = array<long> of ``m_bits/64`` words (missing words are
    zero-filled so ``element_at`` probing is total)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(
        F.array(*[F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.expr("pos div 64").alias("widx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
    )
    # Densify to a fixed-size array: map widx->word, then read every
    # slot 0..n_words-1 (absent -> 0).  One row, bounded size.
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("widx", "word"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(try_element_at(wm, cast(i as bigint)), cast(0 as bigint)))"
        ).alias("bloom")
    )


def bloom_might_contain(key: str, bloom_col: str = "bloom", m_bits: int = 1 << 16, k: int = 3):
    """Column testing all k bit positions of ``key`` against the
    ``array<long>`` produced by :func:`bloom_build` (1-indexed
    ``element_at``).  Map-side only; false positives possible, false
    negatives impossible."""
    cond = F.lit(True)
    for i in range(k):
        pos = f"pmod(xxhash64({key}, {i}), {m_bits})"
        test = (
            f"(element_at({bloom_col}, cast(({pos}) div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({pos}) % 64 as int))) != 0"
        )
        cond = cond & F.expr(test)
    return cond
