"""foreachBatch sinks: transactional-ish delivery to batch-only targets.

``foreachBatch`` is the bridge between a streaming query and any sink
Spark can write in batch (parquet dirs, JDBC, multiple sinks at once).
Exactly-once delivery is the caller's job: Spark replays a failed
micro-batch with the SAME ``batch_id``, so a sink that writes
idempotently per batch_id (overwrite-by-batch-directory here) gets
effective exactly-once on top of the checkpoint's at-least-once.

Reference note: the reference writes results only to an in-memory
client vector (MapReduceFramework.cpp:204-218, outputVec); durable
sinks are part of the capability extension (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_parquet(
    agg: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> StreamingQuery:
    """Stream ``agg`` into ``out_dir`` one parquet subdirectory per
    micro-batch (``batch_id=N/``). A replayed batch id overwrites its
    own directory and nothing else — idempotent, so the sink is
    exactly-once end to end.

    Reader contract: a plain ``read.parquet(out_dir)`` returns EVERY
    batch's rows (update mode re-emits a key each time it changes), in
    no particular order. To reconstruct current state a reader MUST
    keep, per key, the row with the highest ``batch_id`` — use
    :func:`read_current_state`, or equivalently a
    ``row_number() over (partition by key order by batch_id desc)``
    filter as ``tests/test_streaming_sinks.py`` does.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic overwrite of exactly this batch's partition
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        agg.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def read_current_state(
    spark,
    out_dir: str,
    key_cols: list[str],
) -> DataFrame:
    """Reader for :func:`foreach_batch_parquet` output: latest row per
    key across all batch directories (highest ``batch_id`` wins; the
    hive-style ``batch_id=N`` path component is read back as a column).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch_id=*")
    w = Window.partitionBy(*key_cols).orderBy(F.col("batch_id").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "batch_id")
    )


def foreach_batch_fanout(
    agg: DataFrame,
    sinks: list[Callable[[DataFrame, int], None]],
    checkpoint_dir: str,
    output_mode: str = "update",
) -> StreamingQuery:
    """One streaming query, several destinations per micro-batch (the
    multi-sink pattern — e.g. parquet + metrics + alerting). The batch
    DataFrame is persisted so N sinks cost one upstream computation,
    not N re-executions of the micro-batch plan."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return (
        agg.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
