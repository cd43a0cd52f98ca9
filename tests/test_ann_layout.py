"""End-to-end demo of the ANN physical-layout story from SCALE.md:
write the vector corpus hive-partitioned by its IVF centroid (q39's
assignment, via the shared ``ivf_assignments`` pipeline), then serve a
probe by scanning ONLY the probe's partition — asserting both partition
pruning in the plan and that the pruned search returns exactly the same
top-k as searching the full corpus restricted to that centroid."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.functions.vector import cosine_similarity
from multi_threaded_mapreduce_framework_spark.plans.inspect import partition_filters
from multi_threaded_mapreduce_framework_spark.queries.t2_dedup import ivf_assignments


@pytest.fixture(scope="module")
def ivf_lake(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "vectors")
    ivf_assignments(spark, sf_dir).drop("sim").write.partitionBy(
        "centroid_id"
    ).parquet(path)
    return path


def test_probe_reads_one_partition(spark, sf_dir, ivf_lake):
    assigned = ivf_assignments(spark, sf_dir)
    probe = assigned.filter("vec_id = 0").collect()[0]
    lake = spark.read.parquet(ivf_lake)
    candidates = lake.filter(F.col("centroid_id") == probe.centroid_id)
    # the centroid filter must prune partitions at the scan
    pf = " ".join(partition_filters(candidates))
    assert "centroid_id" in pf, pf

    # pruned-partition top-k == full-corpus top-k restricted to the bucket
    pv = F.array(*[F.lit(x) for x in probe.v])
    topk_pruned = (
        candidates.filter("vec_id <> 0")
        .select("vec_id", cosine_similarity("v", pv).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    topk_full = (
        assigned.filter(
            (F.col("centroid_id") == probe.centroid_id) & (F.col("vec_id") != 0)
        )
        .select("vec_id", cosine_similarity("v", pv).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert [(r.vec_id, round(r.sim, 6)) for r in topk_pruned] == [
        (r.vec_id, round(r.sim, 6)) for r in topk_full
    ]
    assert len(topk_pruned) == 5
