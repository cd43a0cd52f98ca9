"""Zero-extra-pass pipeline observability via ``DataFrame.observe``.

The reference engine's only runtime introspection is the polled
``{stage, percentage}`` progress struct (reference
``MapReduceFramework.h:60-66`` via ``getJobState``); it cannot report
anything about the DATA flowing through a job. This operator is the
Spark-native generalization: named aggregate metrics are attached to a
plan node and collected AS A SIDE EFFECT of whatever action executes
the query — no second scan, no extra shuffle, exact values.

At 100 TB this is the difference between auditing a pipeline (row
counts in/out of every gate, null rates, clipped values) for free and
paying a full re-read per audit query: the metrics ride the same
tasks that do the work. For streaming, the same metrics surface per
micro-batch through ``StreamingQueryListener``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observed_filter(
    df: DataFrame, condition, metrics_name: str = "gate"
) -> tuple[DataFrame, Observation]:
    """Apply ``filter(condition)`` while observing, in the SAME pass:
    rows seen, rows kept, and the kept fraction's numerator/denominator
    as exact longs (ratios computed by the caller — a metric must be an
    aggregate expression).

    Returns ``(filtered_df, observation)``; read
    ``observation.get`` AFTER an action has executed the returned
    DataFrame. A second action re-observes (values refresh per
    execution), which is exactly the per-run audit-log semantics a
    pipeline wants.
    """
    obs = Observation(metrics_name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(condition, 1).otherwise(0)).alias("rows_kept"),
    )
    return observed.filter(condition), obs


def observed_quality_gates(df: DataFrame) -> tuple[DataFrame, Observation]:
    """q132's keep gate with its audit metrics collected in-pass: the
    returned DataFrame yields only kept documents, and the observation
    reports per-gate violation counts over EVERY scanned document —
    the numbers a curation run logs without a second corpus read.

    Expects a ``documents``-shaped input (doc_id, text, ...).
    """
    n = F.size(F.split("text", " "))
    mwl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n.cast(
        "double"
    )
    stopf = F.expr(
        "size(filter(split(text, ' '), w -> w = 'the' OR w = 'a'))"
    ) / n.cast("double")
    topf = F.expr(
        "array_max(transform(array_distinct(split(text, ' ')),"
        " w -> size(filter(split(text, ' '), x -> x = w))))"
    ) / n.cast("double")
    gates = {
        "fail_len": (n < 15) | (n > 1000),
        "fail_mwl": (mwl < 3.0) | (mwl > 8.0),
        "fail_stop": stopf > 0.15,
        "fail_top": topf > 0.2,
    }
    obs = Observation("quality_gates")
    fail_any = None
    metrics = [F.count(F.lit(1)).alias("docs_seen")]
    for name, cond in gates.items():
        metrics.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
        fail_any = cond if fail_any is None else (fail_any | cond)
    metrics.append(
        F.sum(F.when(~fail_any, 1).otherwise(0)).alias("docs_kept")
    )
    return df.observe(obs, *metrics).filter(~fail_any), obs
