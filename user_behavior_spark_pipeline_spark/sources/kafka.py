"""Kafka source/sink builders (OP-SRC-KAFKA-BATCH / OP-SRC-KAFKA-STREAM).

The reference reads topic ``events`` both bounded (startingOffsets=earliest,
endingOffsets=latest — filter_swords_batch.py:47-54) and unbounded
(readStream — write_swords_stream.py:45-50). These builders produce exactly
those readers; ``.load()`` requires the spark-sql-kafka connector jar and a
broker, neither of which exists in the test container, so tests exercise the
file-based test double (streaming.jobs) which yields the same record schema
(FIXTURES.md §1).

100 TB posture: ``minPartitions`` splits Kafka partitions into more Spark
tasks than topic partitions when consumers are the bottleneck;
``maxOffsetsPerTrigger`` bounds micro-batch size so a backlogged topic can't
produce an unboundedly large batch after downtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TOPIC = "events"  # README.md:212-214


def kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded snapshot of a topic (filter_swords_batch.py:47-54)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    max_offsets_per_trigger: int | None = 1_000_000,
    min_partitions: int | None = None,
) -> DataFrame:
    """Unbounded topic scan (write_swords_stream.py:45-50)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def is_kafka_available(spark: SparkSession) -> bool:
    """True if the Kafka connector jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False
