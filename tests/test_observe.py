"""Observation-metric operator tests: metrics ride the SAME execution
(no second scan), values are exact, and they agree with independently
computed aggregates."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.operators.observe import (
    observed_filter,
    observed_quality_gates,
)
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.sources import load_table


def test_observed_filter_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out, obs = observed_filter(li, F.col("l_quantity") > 25, "qty_gate")
    kept = out.count()  # the action that also materializes the metrics
    m = obs.get
    assert m["rows_kept"] == kept
    assert m["rows_seen"] == li.count()
    assert m["rows_seen"] >= m["rows_kept"]
    # independent check of the kept count
    assert kept == li.filter(F.col("l_quantity") > 25).count()


def test_observed_quality_gates_match_q132(spark, sf_dir):
    """The in-pass gate metrics must equal the q132 report's aggregate
    truth: docs_seen = corpus size, docs_kept = q132 keep=1 count, and
    each per-gate violation count = the matching fail_mask bit sum."""
    docs = load_table(spark, sf_dir, "documents")
    out, obs = observed_quality_gates(docs)
    kept_rows = out.count()
    m = obs.get
    q132 = all_queries()["q132_quality_gates"].builder(spark, sf_dir)
    agg = q132.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("keep").alias("kept"),
        F.sum(F.expr("CAST(fail_mask & 1 > 0 AS INT)")).alias("len"),
        F.sum(F.expr("CAST(fail_mask & 2 > 0 AS INT)")).alias("mwl"),
        F.sum(F.expr("CAST(fail_mask & 4 > 0 AS INT)")).alias("stop"),
        F.sum(F.expr("CAST(fail_mask & 8 > 0 AS INT)")).alias("top"),
    ).first()
    assert m["docs_seen"] == agg["n"]
    assert m["docs_kept"] == agg["kept"] == kept_rows
    assert m["fail_len"] == agg["len"]
    assert m["fail_mwl"] == agg["mwl"]
    assert m["fail_stop"] == agg["stop"]
    assert m["fail_top"] == agg["top"]


def test_observation_refreshes_per_action(spark, sf_dir):
    """A second action re-executes and re-observes — per-run audit-log
    semantics (values stay exact, not accumulated across runs)."""
    docs = load_table(spark, sf_dir, "documents")
    out, obs = observed_filter(docs, F.col("doc_id") % 2 == 0, "parity")
    out.count()
    first = dict(obs.get)
    out.count()
    second = dict(obs.get)
    assert first == second  # refreshed, not doubled
