"""Tests for the small-file compaction operator (operators/compact.py)."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.operators.compact import (
    _parquet_files,
    compact_parquet_dir,
)


def _checksum(spark, path):
    df = spark.read.parquet(path)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def test_compaction_reduces_files_and_preserves_data(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        # 64 tiny files
        spark.range(0, 10_000).withColumn("v", F.col("id") * 3).repartition(
            64
        ).write.parquet(path)
        assert len(_parquet_files(path)) == 64
        before = _checksum(spark, path)
        stats = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
        assert stats.files_before == 64
        assert stats.files_after == 1
        assert len(_parquet_files(path)) == 1
        after = _checksum(spark, path)
        assert (before["n"], before["h"]) == (after["n"], after["h"])


def test_compaction_noop_when_already_packed(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        spark.range(0, 1000).coalesce(1).write.parquet(path)
        files = sorted(_parquet_files(path))
        stats = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
        assert stats.files_before == stats.files_after == 1
        # untouched: same file names (no rewrite happened)
        assert sorted(_parquet_files(path)) == files


def test_compaction_respects_target_size(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        spark.range(0, 200_000).withColumn(
            "pad", F.sha2(F.col("id").cast("string"), 256)
        ).repartition(32).write.parquet(path)
        total = sum(os.path.getsize(f) for f in _parquet_files(path))
        target = total // 4  # expect ~4-5 output files
        stats = compact_parquet_dir(spark, path, target_file_bytes=target)
        assert 4 <= stats.files_after <= 6, stats
        # no temp/old residue left behind
        parent = os.path.dirname(path)
        assert [e for e in os.listdir(parent) if "._compact-" in e or "._old-" in e] == []
