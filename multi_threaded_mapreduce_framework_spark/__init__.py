"""PySpark-native analytics engine with the query/data-processing
capabilities of Yonghao-Lee/Multi-Threaded-MapReduce-Framework.

The reference (surveyed in SURVEY.md) is a single-process multithreaded
MapReduce library: ``map -> sort -> shuffle(group-by-key) -> reduce`` over
in-memory key/value pairs (reference ``MapReduceFramework.cpp:118-248``).
This package re-expresses that computational model — and everything
expressible within it — as idiomatic Spark DataFrame plans optimized by
Catalyst, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB deployment of such an engine needs.

Layout:
- ``session``    SparkSession factory (AQE, Arrow, tuned shuffle partitions)
- ``sources``    fixture/table loaders (parquet; ns-timestamp handling)
- ``operators``  the MapReduce client-contract adapter (``run_mapreduce``),
                 dedup/similarity operators, multimodal plumbing
- ``functions``  reusable column expression builders (text stats, vector math)
- ``plans``      job/progress facade mirroring the reference control plane
- ``queries``    the declared, oracle-checked query inventory (SURVEY.md §2.3)
- ``streaming``  Structured Streaming demonstration path (SURVEY.md §2.4)
"""

from multi_threaded_mapreduce_framework_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
