"""Stream/batch parity: replay events.parquet through Structured
Streaming and compare against the batch analytics."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.relational.events import q_events_hourly
from searchengine_spark.streaming.events import (
    dedup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory,
    session_window_stream,
)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    run_to_memory(hourly_rollup_stream(stream), "hourly_mem", output_mode="complete")

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_mem").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == batch


def test_session_window_stream_counts(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(
        session_window_stream(stream), "sessions_mem", output_mode="complete"
    )
    sessions = spark.table("sessions_mem")
    total_events = sessions.agg(F.sum("n_events")).collect()[0][0]
    from searchengine_spark.io import load_table

    assert total_events == load_table(spark, sf_dir, "events").count()
    # Every session's span respects the gap rule trivially:
    # end - start >= 0 and bounded by the overall time range.
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_stream_static_join_enrichment(spark, sf_dir):
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import enrich_stream_with_customers

    stream = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    run_to_memory(
        enrich_stream_with_customers(stream, cust), "enriched_mem", output_mode="append"
    )
    enriched = spark.table("enriched_mem")
    n_events = load_table(spark, sf_dir, "events").count()
    assert enriched.count() == n_events  # left join keeps every event
    # at least some users resolve to a segment
    assert enriched.filter(F.col("c_mktsegment").isNotNull()).count() > 0


def test_dedup_stream_removes_nothing_on_unique_ids(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(dedup_stream(stream), "dedup_mem", output_mode="append")
    from searchengine_spark.io import load_table

    n_raw = load_table(spark, sf_dir, "events").count()
    assert spark.table("dedup_mem").count() == n_raw


def test_rate_source_stream_flows_through_rollup(spark, sf_dir):
    """The rate-source synthetic stream (local Kafka stand-in) must
    (a) expose the exact events schema, so every streaming operator
    runs unchanged on it, and (b) actually flow: a windowed rollup
    over it produces rows within a few micro-batches."""
    import time

    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import read_rate_events_stream

    stream = read_rate_events_stream(spark, rows_per_second=200)
    assert stream.isStreaming
    batch_schema = dict(load_table(spark, sf_dir, "events").dtypes)
    assert dict(stream.dtypes) == batch_schema

    rolled = hourly_rollup_stream(stream, watermark="10 minutes")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rate_rollup_mem")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("rate_rollup_mem").count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table("rate_rollup_mem").collect()
        assert rows, "no micro-batch produced output within 60s"
        assert all(r.n_events > 0 for r in rows)
        assert {r.event_type for r in rows} <= {
            "click", "view", "purchase", "signup", "error"
        }
    finally:
        q.stop()


def test_session_window_stream_matches_batch_native(spark, sf_dir):
    """Three-way agreement closes: the STREAMING session_window result
    equals the BATCH native session_window query (which itself
    hash-matches the portable lag+cumsum SQL oracle)."""
    from searchengine_spark.relational.events import (
        q_events_native_session_window,
    )

    stream = read_events_stream(spark, sf_dir)
    run_to_memory(
        session_window_stream(stream), "sessions_parity_mem", output_mode="complete"
    )
    got = {
        (r.user_id, r.session_start): (r.n_events, round(r.session_value, 6))
        for r in spark.table("sessions_parity_mem")
        .select(
            "user_id",
            F.col("session_start"),
            "n_events",
            "session_value",
        )
        .collect()
    }
    batch = {
        (r.user_id, r.session_start): (r.n_events, round(r.session_value, 6))
        for r in q_events_native_session_window(spark, sf_dir).collect()
    }
    assert got == batch


def test_view_purchase_join_stream_matches_batch(spark, sf_dir):
    """Stream-stream interval join == batch interval join on the same
    table (replay-wide watermark, so no row is ever late)."""
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import view_purchase_join_stream
    from searchengine_spark.streaming.replay import (
        q_stream_view_purchase_join_replay,
    )

    got = {
        (r.view_event_id, r.purchase_event_id)
        for r in q_stream_view_purchase_join_replay(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("ve"), "user_id", F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    batch = {
        (r.ve, r.pe)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == batch


def test_view_purchase_join_state_bounded_by_range_condition(spark, sf_dir):
    """The join must carry the event-time range predicate into the
    streaming plan (it is what bounds join state); assert the
    topology actually runs in append mode with both sides
    watermarked."""
    from searchengine_spark.streaming.events import (
        read_events_stream,
        view_purchase_join_stream,
    )

    views = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = view_purchase_join_stream(views, purchases, watermark="2 hours")
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()


def test_left_outer_join_replay_emits_unmatched_views(spark, sf_dir):
    """The watermark sentinel must flush EVERY unmatched view as a
    null row — total emitted views == batch view count, and matched +
    unmatched partition it. (Hash parity vs the LEFT JOIN oracle is
    test_oracle_parity.py's job.)"""
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.replay import (
        q_stream_view_purchase_left_join_replay,
    )

    got = q_stream_view_purchase_left_join_replay(spark, sf_dir).cache()
    unmatched = got.filter(F.col("purchase_event_id").isNull()).count()
    matched_views = (
        got.filter(F.col("purchase_event_id").isNotNull())
        .select("view_event_id")
        .distinct()
        .count()
    )
    n_views = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert unmatched + matched_views == n_views
    assert unmatched > 0  # the flush really happened
    got.unpersist()


def test_hll_rollup_replay_matches_oracle_and_bounds(spark, sf_dir):
    """Streaming HLL++ uniques per window: exact halves hash-match
    the batch oracle, the sketch estimate sits within its rel-err
    bound in EVERY window."""
    from searchengine_spark.streaming.replay import (
        ORACLES,
        q_stream_hll_rollup_replay,
    )
    from tests.helpers import assert_matches_oracle

    got = q_stream_hll_rollup_replay(spark, sf_dir).cache()
    assert got.count() > 0
    assert got.filter(~F.col("users_err_ok")).count() == 0
    assert_matches_oracle(
        got,
        ORACLES["stream_hll_rollup_replay"],
        sf_dir,
        name="stream_hll_rollup_replay",
    )
    got.unpersist()


def test_replay_partitions_sizing(spark, sf_dir):
    """Bounded replays size state partitions from input rows, clamped
    to [8, session default] — and restore the session conf after."""
    from searchengine_spark.streaming.replay import _replay_partitions

    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = _replay_partitions(spark, sf_dir)
    assert 8 <= parts <= max(8, default)
    # tiny sf0.001 input -> the floor
    assert parts == 8
    # conf untouched by the sizing call itself
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == default


def test_run_to_memory_restores_shuffle_conf(spark, sf_dir):
    from searchengine_spark.streaming.events import (
        hourly_rollup_stream,
        read_events_stream,
        run_to_memory,
    )
    from searchengine_spark.streaming.replay import REPLAY_WATERMARK

    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    run_to_memory(
        hourly_rollup_stream(stream, watermark=REPLAY_WATERMARK),
        "test_restore_conf_sink",
        output_mode="complete",
        shuffle_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.table("test_restore_conf_sink").count() > 0
