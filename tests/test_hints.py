"""Join-strategy and rebalance hint surface: each hint must actually
flip the physical operator (the control a 100 TB tuner reaches for
when AQE's default choice is wrong for a known workload)."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.plans import executed_plan
from multi_threaded_mapreduce_framework_spark.sources import load_table


def _sides(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return c, o


def test_broadcast_hint_forces_bhj(spark, sf_dir):
    c, o = _sides(spark, sf_dir)
    plan = executed_plan(o.join(c.hint("broadcast"), c.c_custkey == o.o_custkey))
    assert "BroadcastHashJoin" in plan, plan


def test_merge_hint_forces_smj(spark, sf_dir):
    c, o = _sides(spark, sf_dir)
    plan = executed_plan(o.join(c.hint("merge"), c.c_custkey == o.o_custkey))
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_shuffle_hash_hint_forces_shj(spark, sf_dir):
    c, o = _sides(spark, sf_dir)
    plan = executed_plan(o.join(c.hint("shuffle_hash"), c.c_custkey == o.o_custkey))
    assert "ShuffledHashJoin" in plan, plan


def test_rebalance_hint_inserts_aqe_shuffle(spark, sf_dir):
    """REBALANCE asks AQE to split/coalesce output partitions to target
    size — the skew-safe pre-write repartition (used before large
    parquet writes so no task writes a giant file)."""
    c, _ = _sides(spark, sf_dir)
    df = c.hint("rebalance", "c_mktsegment")
    plan = executed_plan(df)
    assert "Exchange" in plan, plan
    # AQE marker: the rebalance exchange carries REBALANCE_PARTITIONS_*
    assert "REBALANCE" in plan or "AQEShuffleRead" in plan, plan
