"""Kafka-shaped streaming source (wire-compatible local stand-in).

The reference ingests only static files; a production deployment of
this engine consumes events from Kafka. This container has no broker
and no spark-sql-kafka package, so this module implements the exact
*wire contract* of Spark's Kafka source — records with
(key binary, value binary, topic, partition, offset, timestamp,
timestampType), per-key partition affinity, per-partition dense
monotonic offsets — over a replayable parquet "topic log". Swapping
in real Kafka changes ONE line (`readStream.format("kafka")`); every
downstream operator (parse, rollup, sessionize, dedup, enrich) runs
unchanged, and the tests prove the full produce → consume → parse →
aggregate loop equals the batch answer.

Design choices, stated:
- value is JSON with `ts_us` as epoch-micros (not an ISO string):
  deterministic round-trip, timezone-proof, and how high-volume
  pipelines actually encode event time.
- partitioner is `pmod(user_id, n_partitions)` — preserves Kafka's
  guarantee that matters (same key → same partition → per-key order);
  murmur2-compatibility is irrelevant to semantics.
- offsets are assigned by a per-partition row_number over event time.
  That window is a simulation artifact: a real broker assigns offsets
  at append time. It shuffles on `partition` (max n_partitions
  tasks), which is fine for generating test topics, and is NOT part
  of the consume path that runs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.event_time import epoch_micros_to_ntz, event_time_micros

# What spark.readStream.format("kafka") returns, column for column.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

# JSON payload carried in `value`.
EVENT_VALUE_SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def events_to_kafka_records(
    events: DataFrame, *, topic: str = "events", n_partitions: int = 8
) -> DataFrame:
    """Encode an events DataFrame as Kafka wire records (the
    "producer" half of the simulation)."""
    ts_us = event_time_micros(events, "ts")
    keyed = events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                ts_us.alias("ts_us"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod("user_id", F.lit(n_partitions)).cast("int").alias("partition"),
        # Wire timestamp is an instant (Kafka's CreateTime), derived
        # from the same deterministic micros.
        F.timestamp_micros(ts_us).alias("timestamp"),
        "event_id",
    )
    w = Window.partitionBy("partition").orderBy("timestamp", "event_id")
    return keyed.select(
        "key",
        "value",
        "topic",
        "partition",
        (F.row_number().over(w) - 1).cast("bigint").alias("offset"),
        "timestamp",
        F.lit(0).alias("timestampType"),  # 0 = CreateTime
    )


def write_kafka_topic(records: DataFrame, path: str) -> None:
    """Persist wire records as a partition-per-directory parquet log
    (mimics topic/partition segment layout; gives the file stream
    source per-partition split parallelism)."""
    records.write.partitionBy("partition").mode("overwrite").parquet(path)


def read_kafka_topic_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 4
) -> DataFrame:
    """The "consumer": an unbounded read of the topic log with the
    exact Kafka source schema. Real deployment replaces this body
    with spark.readStream.format("kafka").option("subscribe", ...)."""
    return (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def parse_events_from_kafka(records: DataFrame) -> DataFrame:
    """Decode wire records back to the canonical events schema.
    Works identically on streaming and batch frames; malformed
    payloads are tagged via from_json's corrupt-record column and
    filtered out instead of failing the query — at 100 TB a poison
    record must never kill the job."""
    parsed = records.select(
        F.from_json(
            F.col("value").cast("string"),
            EVENT_VALUE_SCHEMA + ", _corrupt string",
            {"columnNameOfCorruptRecord": "_corrupt"},
        ).alias("e")
    )
    return parsed.filter(
        F.col("e").isNotNull() & F.col("e._corrupt").isNull()
    ).select(
        F.col("e.event_id").alias("event_id"),
        epoch_micros_to_ntz(F.col("e.ts_us")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )
