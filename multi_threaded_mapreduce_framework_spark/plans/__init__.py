"""Physical-plan inspection utilities.

The reference engine has no plan representation (its pipeline is
hard-coded, SURVEY.md §4); in this engine the plan IS the product —
these helpers make plan *quality* assertable in tests: filters reach
the scan, small dims broadcast, aggregations have a map-side partial
phase, codegen covers the hot path. Regressions in any of these are
invisible at test scale but dominate cost at 100 TB, so they're tested
like correctness.
"""

from multi_threaded_mapreduce_framework_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_partial_aggregate,
    join_strategies,
    num_exchanges,
    plan_shape,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "join_strategies",
    "num_exchanges",
    "plan_shape",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_ids",
]
