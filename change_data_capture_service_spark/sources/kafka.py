"""Kafka source/sink builders (reference R18/R19).

The reference publishes keyed JSON synchronously per event with acks=all
(``internal/kafka/producer.go:17-47``) and consumes via a group reader
(``cmd/es_consumer/main.go:44-64``). The engine expresses both as
Structured Streaming's Kafka connector; batching, acks, backpressure and
offset management are connector options instead of hand-rolled loops.

The test container has no broker and no spark-sql-kafka jar, so these
builders CONSTRUCT the plans but callers must ``start()`` them against a
real cluster; ``kafka_available()`` gates tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import envelope as env


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka").option("kafka.bootstrap.servers", "x:1").option(
            "subscribe", "t"
        ).load()
        return True
    except Exception:
        return False


def read_change_topic(spark: SparkSession, brokers: str, topic: str, group_id: str = "cdc-engine") -> DataFrame:
    """Kafka topic of envelope JSON -> unbounded envelope DataFrame.
    Offsets live in the query checkpoint (commits after successful batches
    -- the behavior the reference's consumer was missing)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("kafka.group.id", group_id)
        .option("startingOffsets", "earliest")
        .load()
    )
    return env.from_json_value(raw.selectExpr("CAST(value AS STRING) AS value"))


def write_change_topic(envelope_df: DataFrame, brokers: str, topic: str):
    """Envelope DataFrame -> keyed Kafka records (key = ``schema.table:pk``
    so per-key ordering/partitioning holds, reference
    ``producer.go:24`` + ``replicator.go:374-379``). Returns the
    DataStreamWriter; caller adds checkpoint + start()."""
    wire = env.to_json_value(envelope_df)
    return (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
