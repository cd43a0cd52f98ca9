"""Kafka-wire-format source path (SURVEY.md §2.4).

The production deployment of a streaming analytics engine reads Kafka;
this container has no broker and no ``spark-sql-kafka`` connector jar,
so the module splits the problem the way the code would be deployed:

- ``parse_events(raw)`` — the REAL production logic: turn a DataFrame
  in Kafka's wire schema (``key``/``value`` binary, ``topic``,
  ``partition``, ``offset``, ``timestamp``) into typed events rows via
  ``from_json`` on the value payload. This function is identical
  whether ``raw`` came from ``format("kafka")`` or from the replay
  below, and it is what the tests verify.
- ``write_kafka_replay`` / ``kafka_wire_stream`` — a file-backed stand-in
  producing byte-exact wire rows (value = JSON payload bytes, key =
  user id bytes, offsets dense per partition) so the parse path and
  downstream windowed aggregations run against realistic input.
- ``real_kafka_stream`` — the one-liner that swaps in the real source;
  it raises ``KafkaConnectorUnavailable`` here (connector jar absent),
  and the test asserts exactly that, so the gate is itself covered.

Reference note: the reference engine is batch-only (SURVEY.md §2.2);
this is capability extension, not parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from multi_threaded_mapreduce_framework_spark.sources import load_table

#: Kafka's fixed wire schema as Spark sees it (connector docs).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

#: JSON payload schema for events (ts carried as epoch micros so the
#: round-trip is exact — ISO strings would lose the micro precision
#: guarantee across writers).
EVENTS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


class KafkaConnectorUnavailable(RuntimeError):
    """Raised when format('kafka') has no backing connector jar."""


def write_kafka_replay(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    topic: str = "events",
    n_partitions: int = 4,
    n_chunks: int = 4,
) -> None:
    """Encode the events fixture as Kafka wire rows: value = JSON bytes
    of the payload, key = user_id bytes (Kafka's partition-by-key
    convention), offsets dense and ordered by ts within each topic
    partition — byte-shape-identical to what format('kafka') yields."""
    ev = load_table(spark, sf_dir, "events")
    part = (F.col("user_id") % n_partitions).cast("int")
    w = Window.partitionBy("partition").orderBy("ts_us", "event_id")
    wire = (
        ev.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .withColumn("partition", part)
        .withColumn(
            "value",
            F.to_json(
                F.struct(
                    "event_id", "ts_us", "user_id", "event_type", "value", "props"
                )
            ).cast("binary"),
        )
        .withColumn("key", F.col("user_id").cast("string").cast("binary"))
        .withColumn("topic", F.lit(topic))
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .withColumn("timestamp", F.timestamp_micros(F.col("ts_us")))
        .select([f.name for f in KAFKA_WIRE_SCHEMA.fields])
    )
    wire.repartition(n_chunks).write.mode("overwrite").parquet(out_dir)


def kafka_wire_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Stream of wire rows, one file per trigger (micro-batch)."""
    return (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def real_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """The production source — same downstream ``parse_events`` applies.
    Raises :class:`KafkaConnectorUnavailable` when the connector jar is
    not on the classpath (this container)."""
    try:
        df = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .load()
        )
        df.schema  # force source resolution
        return df
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise KafkaConnectorUnavailable(
            "spark-sql-kafka connector not on classpath; use "
            "kafka_wire_stream() replay for local runs"
        ) from exc


def parse_events(raw: DataFrame) -> DataFrame:
    """Wire rows -> typed events rows (the production parse path):
    ``from_json`` on the value bytes, epoch-micros restored to a
    timestamp. Malformed payloads yield null structs (PERMISSIVE) and
    are dropped explicitly — at 100 TB/day a poison message must never
    kill the query."""
    payload = F.from_json(F.col("value").cast("string"), EVENTS_PAYLOAD_SCHEMA)
    return (
        raw.select(payload.alias("p"))
        .filter(F.col("p").isNotNull() & F.col("p.event_id").isNotNull())
        .select(
            F.col("p.event_id").alias("event_id"),
            F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
            F.col("p.user_id").alias("user_id"),
            F.col("p.event_type").alias("event_type"),
            F.col("p.value").alias("value"),
            F.col("p.props").alias("props"),
        )
    )
