"""Kafka-shaped source: wire-contract invariants and full
produce → consume → parse → aggregate parity with batch."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.relational.events import q_events_hourly
from searchengine_spark.streaming.events import hourly_rollup_stream, run_to_memory
from searchengine_spark.streaming.kafka_shim import (
    events_to_kafka_records,
    parse_events_from_kafka,
    read_kafka_topic_stream,
    write_kafka_topic,
)


@pytest.fixture(scope="module")
def topic_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kafka") / "events_topic")
    events = load_table(spark, sf_dir, "events")
    write_kafka_topic(events_to_kafka_records(events, n_partitions=4), path)
    return path


def test_wire_contract(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rec = events_to_kafka_records(events, n_partitions=4)
    assert [f.name for f in rec.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    assert dict(rec.dtypes)["key"] == "binary"
    assert dict(rec.dtypes)["value"] == "binary"
    # Same key always lands on the same partition.
    assert (
        rec.select("key", "partition").distinct()
        .groupBy("key").count().filter("count > 1").count() == 0
    )
    # Offsets are dense and monotonic per partition: 0..n-1.
    per_part = rec.groupBy("partition").agg(
        F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("offset").alias("nd"),
    )
    bad = per_part.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("n") != F.col("nd"))
    )
    assert bad.count() == 0


def test_parse_roundtrip_exact(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    back = parse_events_from_kafka(events_to_kafka_records(events))
    assert back.schema == events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).schema
    # Exact row-level round trip (micros-encoded ts is lossless).
    diff = back.exceptAll(events).union(events.exceptAll(back))
    assert diff.count() == 0


def test_malformed_value_quarantined_not_fatal(spark):
    rows = [(bytearray(b"{not json"),), (bytearray(b'{"event_id": 7, "ts_us": 1000000, "user_id": 1, "event_type": "click", "value": 1.5, "props": "{}"}'),)]
    raw = spark.createDataFrame(rows, "value binary")
    out = parse_events_from_kafka(raw).collect()
    assert [r.event_id for r in out] == [7]


def test_stream_consume_rollup_matches_batch(spark, sf_dir, topic_dir):
    stream = read_kafka_topic_stream(spark, topic_dir)
    assert stream.isStreaming
    parsed = parse_events_from_kafka(stream)
    run_to_memory(hourly_rollup_stream(parsed), "kafka_hourly", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("kafka_hourly").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == batch
