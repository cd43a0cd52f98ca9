"""Chunking parity: the UDTF and the column-algebra chunker agree
row-for-row, and edge cases (short doc, exact multiple, overlap tail)
match the documented chunk math."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.functions.chunking import (
    chunk_expr,
    register_chunk_udtf,
)
from multi_threaded_mapreduce_framework_spark.sources import load_table


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_udtf_matches_column_algebra(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    expr_side = chunk_expr(docs, "text", size=32, stride=24).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    )
    register_chunk_udtf(spark, "chunk_text_t")
    docs.createOrReplaceTempView("_chunk_docs")
    udtf_side = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
           FROM _chunk_docs d, LATERAL chunk_text_t(d.text, 32, 24) c"""
    )
    assert _rows(expr_side) == _rows(udtf_side)


def test_arrow_udtf_matches_pickled_udtf(spark, sf_dir):
    """The Arrow-optimized UDTF registration (useArrow=True) is
    semantically identical to the pickled row-at-a-time form and to the
    column-algebra scale path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    register_chunk_udtf(spark, "chunk_text_arrow", use_arrow=True)
    docs.createOrReplaceTempView("_chunk_docs_arrow")
    arrow_side = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
           FROM _chunk_docs_arrow d, LATERAL chunk_text_arrow(d.text, 32, 24) c"""
    )
    expr_side = chunk_expr(docs, "text", size=32, stride=24).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    )
    assert _rows(arrow_side) == _rows(expr_side)


@pytest.mark.parametrize(
    "n_tokens,size,stride,expected_chunks",
    [
        (5, 32, 24, 1),   # shorter than one window -> exactly one chunk
        (48, 32, 24, 2),  # starts 0, 24 (24 < 48)
        (24, 32, 24, 1),  # start 24 would be >= n -> single chunk
        (49, 32, 24, 3),  # starts 0, 24, 48 (48 < 49): 1-token tail
    ],
)
def test_chunk_counts(spark, n_tokens, size, stride, expected_chunks):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = chunk_expr(df, "text", size=size, stride=stride).collect()
    assert len(out) == expected_chunks
    # full coverage, correct overlap: concatenating [start, start+stride)
    # of each chunk except the last, plus the whole last chunk,
    # reconstructs the document
    out = sorted(out, key=lambda r: r.chunk_idx)
    rebuilt = []
    for r in out[:-1]:
        rebuilt.extend(r.chunk_text.split(" ")[:stride])
    rebuilt.extend(out[-1].chunk_text.split(" "))
    assert rebuilt == text.split(" ")


def test_chunk_expr_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_expr(df, "text", size=0, stride=24)
    with pytest.raises(ValueError):
        chunk_expr(df, "text", size=32, stride=0)
