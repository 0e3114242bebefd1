"""Kafka source/sink builders (SURVEY.md §2.1 S1, S4).

The reference subscribes topics as streams/tables
(``KafkaStreamsApp.scala:104, :156-160``) and writes with ``.to(topic)``
(``:110, :188``). Spark-first mapping:

* source — ``spark.readStream.format("kafka")`` + JSON deserialize on the
  ``value`` column (:mod:`.json_serde`), event time from the Kafka record
  timestamp (the reference's implicit time source, SURVEY §1.5);
* sink — ``to_json(struct(...))`` into ``value`` then
  ``writeStream.format("kafka")``.

No broker exists in the test environment, so these builders are exercised by
unit tests only up to plan construction; the same deserialize/transform
pipeline is integration-tested through file/memory streams
(:mod:`..streaming`). At scale, ``minPartitions`` decouples Spark read
parallelism from Kafka partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType

from kafka_streams_playground_spark.sources.json_serde import deserialize_json, serialize_json


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
) -> DataFrame:
    """Subscribe ``topic`` as a typed streaming DataFrame (S1).

    Columns: ``key`` (string), ``ts`` (Kafka record timestamp — the
    reference's event-time source, SURVEY §1.5), then the payload fields.
    Malformed JSON values are dropped (S6 semantics).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("ts"),
        F.col("value"),
    )
    return deserialize_json(raw, schema, keep_cols=("key", "ts"))


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    checkpoint_location: str,
    value_cols: tuple[str, ...] = (),
) -> DataStreamWriter:
    """Build a Kafka sink writer (S4, ``.to(topic)`` at ``:110/:188``).

    Caller invokes ``.start()``; at-least-once like the reference (EOS not
    configured there either, ``KafkaStreamsApp.scala:192-195``).
    """
    payload = serialize_json(df, *value_cols)
    out = payload.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
