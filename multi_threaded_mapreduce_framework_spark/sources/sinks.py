"""Source/sink connectors.

The reference has no I/O at all — inputs and outputs are caller-provided
in-memory vectors (reference ``MapReduceClient.h:50,52``) — so every
format here is engine capability the MapReduce model only implied.
Parquet is the primary lake format (columnar, predicate/projection
pushdown); CSV/JSON are interchange formats.

Scale conventions baked into :func:`write_table`:

- ``partition_by``: hive-style directory partitioning — the 100 TB
  layout lever that turns common filters into partition pruning instead
  of file scans.
- ``bucket_by`` (+ ``sort_by``): pre-shuffled layout so repeated joins /
  aggregations on the bucket key skip their exchange entirely
  (requires ``saveAsTable`` — bucketing metadata lives in the catalog).
- a ``repartition(target_files)`` before write controls file count:
  many small files kill scan planning at scale; one file kills
  parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (parquet/csv/json/orc)."""
    if target_files is not None:
        df = df.repartition(target_files)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    location: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table — co-locates
    join/agg keys so later queries on ``bucket_cols`` read pre-shuffled
    data (no exchange). ``location`` makes it an external table (data at
    an explicit path instead of the session warehouse — lets a query
    declare a bucketed layout without caring what warehouse dir the
    calling session was created with)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if location is not None:
        writer = writer.option("path", location)
    writer.saveAsTable(table_name)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. For CSV/JSON pass an explicit ``schema``
    whenever known: schema inference is an extra full scan of the data —
    fine at test scale, unacceptable at 100 TB."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
