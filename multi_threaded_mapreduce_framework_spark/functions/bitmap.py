"""Exact re-aggregatable distinct counting via 64-bit bitmap words
(the groupBitmap / roaring-lite pattern; q153-q164 + the streaming
bitmap matview all build on these expressions).

A word is ``(id >> 6) -> bit_or(1 << (id mod 64))``: 8 bytes cover 64
ids, words are ASSOCIATIVE partial states (OR-merge is exact), and OR
is IDEMPOTENT — a replayed batch cannot change a merged layer.  The
word index uses ARITHMETIC shiftright (floor toward -inf for all
int64) so negative ids pair consistently with ``pmod``; integer ``div``
would collide id -1 with id 63.

The reference engine has no combiner at all (every intermediate pair
crosses the shuffle, ``MapReduceFramework.cpp:160-218``); these
expressions exist to make even COUNT(DISTINCT) — which Spark itself
can only Expand-and-reshuffle — a partial-aggregable, rollup-able
state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: expression template: one set bit per id, within its 64-id word
_BIT = "shiftleft(CAST(1 AS BIGINT), CAST(pmod({id}, 64) AS INT))"


def word_index(id_col: str) -> Column:
    """The id's 64-id word index (arithmetic shift: negative-id safe)."""
    return F.expr(f"shiftright({id_col}, 6)")


def word_bit_agg(id_col: str) -> Column:
    """Aggregate: OR of the group's id bits — one bitmap word."""
    return F.expr(f"bit_or({_BIT.format(id=id_col)})")


def word_bit_agg_when(id_col: str, cond_sql: str) -> Column:
    """Conditional word aggregate (bit only when ``cond_sql`` holds) —
    pivots predicates into word COLUMNS for set algebra (q162)."""
    return F.expr(
        f"bit_or(CASE WHEN {cond_sql} THEN {_BIT.format(id=id_col)} "
        "ELSE CAST(0 AS BIGINT) END)"
    )


def bitmap_layer(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """The finest-granularity word layer: one row per (keys..., wi)
    with the merged word ``w``.  One partial-agg shuffle of ``df``;
    everything coarser derives from this by OR-merge.

    NULL ids are dropped first — a NULL is not an id, matching
    ``COUNT(DISTINCT)``'s null-skipping.  One documented asymmetry
    remains: a key whose ids are ALL null has no layer rows and is
    therefore ABSENT from word-derived counts, where a per-key
    ``COUNT(DISTINCT)`` would report the key with 0."""
    return (
        df.filter(F.col(id_col).isNotNull())
        .groupBy(*keys, word_index(id_col).alias("wi"))
        .agg(word_bit_agg(id_col).alias("w"))
    )


def merge_words(layer: DataFrame, keys: list[str]) -> DataFrame:
    """OR-merge a word layer down to coarser keys (drop columns by
    grouping on fewer keys) — the rollup move."""
    return layer.groupBy(*keys, "wi").agg(F.expr("bit_or(w)").alias("w"))


def count_distinct_words(layer: DataFrame, keys: list[str]) -> DataFrame:
    """Distinct-id count per key from a word layer whose (keys, wi)
    rows are already unique (e.g. output of :func:`merge_words`)."""
    return layer.groupBy(*keys).agg(
        F.sum(F.expr("bit_count(w)")).cast("bigint").alias("distinct_ids")
    )
