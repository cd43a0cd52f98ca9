"""Document chunking: fixed-size token windows with stride/overlap —
the standard preprocessing step that splits long documents into
context-window-sized pieces for LLM training pipelines.

Two implementations with identical semantics:

- :func:`chunk_expr` — pure column expressions (`split` → `sequence` →
  `explode` → `slice` → `array_join`), whole-stage-codegen throughout;
  this is the scale path and what `q85_chunk_documents` declares.
- :class:`ChunkText` — a PySpark user-defined *table* function (UDTF),
  the row→rows escape hatch for chunkers that can't be expressed as
  column algebra (sentence-boundary packing, tokenizer-aware splits).
  Registered per-session via :func:`register_chunk_udtf` and used as a
  SQL ``LATERAL`` join. Semantics match chunk_expr exactly and
  ``tests/test_chunking.py`` pins the parity.

Chunk math, shared by both: tokens = whitespace split; chunk *i* covers
tokens ``[i*stride, min(i*stride + size, n))``; starts are
``0, stride, 2*stride, …`` up to the last start ``< n``; a document
shorter than ``size`` yields exactly one chunk. With ``stride < size``
consecutive chunks overlap by ``size - stride`` tokens.

Reference capability note: chunking is a pure flatMap — one input row,
0..n output rows — i.e. exactly the reference's ``map``/``emit2``
contract (MapReduceClient.h:57-59); the UDTF *is* Spark's typed emit2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def chunk_expr(df: DataFrame, text_col: str, size: int, stride: int) -> DataFrame:
    """Append (chunk_idx, chunk_text, n_tokens) by exploding each row of
    ``df`` into its token-window chunks. JVM-only column algebra: the
    per-row work is O(n_tokens) and the explode multiplies rows by
    ~n/stride, so output volume — not Python overhead — is the cost."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start strictly below n; degenerate n=0 still yields start=0
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.withColumn("_toks", toks).withColumn(
        "_start", F.explode(starts)
    )
    chunk_len = F.least(F.lit(size), F.size(F.col("_toks")) - F.col("_start"))
    return (
        exploded.withColumn("chunk_idx", (F.col("_start") / stride).cast("int"))
        .withColumn(
            "chunk_text",
            F.array_join(F.slice(F.col("_toks"), F.col("_start") + 1, chunk_len), " "),
        )
        .withColumn("n_tokens", chunk_len.cast("int"))
        .drop("_toks", "_start")
    )


class ChunkText:
    """UDTF: ``chunk_text(text, size, stride)`` → rows of
    (chunk_idx int, chunk_text string, n_tokens int).

    Defined as a plain class and wrapped lazily by
    :func:`register_chunk_udtf` — the ``@udtf`` decorator needs no
    active session, but keeping registration explicit keeps imports
    side-effect-free (and lets tests register under a scoped name)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        start, idx = 0, 0
        while True:
            end = min(start + size, n)
            yield idx, " ".join(toks[start:end]), end - start
            start += stride
            idx += 1
            if start >= n:
                break


def register_chunk_udtf(
    spark, name: str = "chunk_text", use_arrow: bool = False
) -> None:
    """Register :class:`ChunkText` for SQL LATERAL use:
    ``SELECT d.doc_id, c.* FROM documents d, LATERAL chunk_text(d.text, 32, 24) c``

    ``use_arrow=True`` registers the Arrow-optimized form: input rows
    reach ``eval`` in Arrow batches instead of pickled one at a time,
    cutting serialization overhead the way pandas UDFs do for scalar
    functions — the variant to prefer on wide fan-out at scale
    (identical semantics; parity pinned in tests/test_chunking.py).
    """
    from pyspark.sql.functions import udtf

    wrapped = udtf(
        ChunkText,
        returnType="chunk_idx int, chunk_text string, n_tokens int",
        useArrow=use_arrow,
    )
    spark.udtf.register(name, wrapped)
