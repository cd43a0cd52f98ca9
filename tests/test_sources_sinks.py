"""Round-trip and layout tests for the source/sink connectors."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.sources import load_table
from multi_threaded_mapreduce_framework_spark.sources.sinks import (
    read_table,
    write_bucketed_table,
    write_table,
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def _bag(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    opts = {"header": "true"} if fmt == "csv" else {}
    write_table(nation, path, fmt=fmt, **opts)
    schema = None
    if fmt in ("csv", "json"):  # text formats need the schema restated
        schema = "n_nationkey bigint, n_name string, n_regionkey bigint"
        if fmt == "csv":
            opts = {"header": "true"}
    back = read_table(spark, path, fmt=fmt, schema=schema, **opts)
    assert _bag(back.select("n_nationkey", "n_name", "n_regionkey")) == _bag(
        nation.select("n_nationkey", "n_name", "n_regionkey")
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_table(orders, path, partition_by=["o_orderstatus"])
    # hive-style layout exists
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = read_table(spark, path).filter(F.col("o_orderstatus") == "F")
    # partition filter must reach the scan (pruning, not post-filter)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_file_count_control(nation, tmp_path):
    path = str(tmp_path / "nation_onefile")
    write_table(nation, path, target_files=1)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1


def test_bucketed_table_joins_without_exchange(spark, sf_dir):
    # bucketed tables need the catalog; uses the default warehouse dir
    # (spark-warehouse/ under cwd, gitignored) and drops tables after
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed_table(cust, "cust_b", ["c_custkey"], 4, sort_cols=["c_custkey"])
    write_bucketed_table(orders, "ord_b", ["o_custkey"], 4, sort_cols=["o_custkey"])
    joined = (
        spark.table("cust_b")
        .join(
            spark.table("ord_b"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("c_custkey", "o_orderkey")
    )
    # disable broadcast so the bucketed layout is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS cust_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
