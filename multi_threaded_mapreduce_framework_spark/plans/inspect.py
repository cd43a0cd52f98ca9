"""Parse Spark physical plans for quality assertions (see package doc)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-planning, pre-execution AQE)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain('formatted')` text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries of every scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries of every scan (partition pruning
    check — the filter reaching here means pruned directories, not
    scanned-then-filtered rows)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names every file scan actually reads (column
    pruning check: a 2-column query must not read 16 columns)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the aggregation has a map-side partial phase (the
    map-side-combine upgrade over the reference's full-shuffle design,
    reference MapReduceFramework.cpp:160-218)."""
    plan = executed_plan(df)
    # partial_ must appear inside an aggregate node's functions list —
    # a loose "both substrings somewhere in the plan" check could match
    # a partial_ function and a HashAggregate from unrelated subtrees.
    return bool(
        re.search(
            r"(?:Hash|ObjectHash|Sort)Aggregate\([^\n]*functions=\[partial_", plan
        )
    )


def num_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of each physical join strategy in the plan (empty = no
    joins). The strategy, not the count of rows, is what survives a
    1000x scale-up — a CartesianProduct here is a bug at any SF."""
    plan = executed_plan(df)
    out = {k: len(re.findall(rf"\b{k}\b", plan)) for k in _JOIN_KINDS}
    return {k: v for k, v in out.items() if v}


def plan_shape(df: DataFrame) -> dict:
    """The scale-deciding plan features, as a stable snapshot dict
    (see tools/snapshot_plans.py). Keys sorted for diff-friendliness."""
    return {
        "exchanges": num_exchanges(df),
        "joins": join_strategies(df),
        "partial_agg": has_partial_aggregate(df),
    }


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct WholeStageCodegen span ids — wider spans = more of the
    plan fused into generated JVM code."""
    return {
        int(m.group(1))
        for m in re.finditer(r"WholeStageCodegen \((\d+)\)", executed_plan(df))
    }
