"""Regenerate tests/plan_snapshot.json: per-query physical-plan shape.

For EVERY registered query this records the scale-deciding plan
features at sf0.001 — shuffle-exchange count, join strategies, and
whether a partial (map-side) aggregate exists — so any refactor that
silently degrades a plan (a broadcast join becoming a shuffled one, an
extra exchange sneaking in) fails `tests/test_plan_quality.py::
test_plan_shape_snapshot` instead of shipping.

Usage: python tools/snapshot_plans.py   # rewrites the snapshot
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_threaded_mapreduce_framework_spark.plans.inspect import plan_shape
from multi_threaded_mapreduce_framework_spark.queries import all_queries
from multi_threaded_mapreduce_framework_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_snapshot.json",
)


def main() -> None:
    spark = get_spark("snapshot-plans", shuffle_partitions=4)
    shapes = {}
    for name, q in sorted(all_queries().items()):
        # same normalization as the test: a persist() left registered by
        # an earlier query must not rewrite this plan to InMemoryTableScan
        spark.catalog.clearCache()
        shapes[name] = plan_shape(q.builder(spark, SF_DIR))
    with open(OUT, "w") as f:
        json.dump(shapes, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{OUT}: {len(shapes)} queries")


if __name__ == "__main__":
    main()
