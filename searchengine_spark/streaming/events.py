"""Structured Streaming versions of the event analytics.

The batch queries in relational/events.py are the oracle for these:
same aggregations expressed over an unbounded stream with watermarks
for late data. The test suite replays the events parquet through a
file stream (maxFilesPerTrigger) into a memory sink and checks the
result equals the batch answer — the standard "stream/batch parity"
correctness argument for Structured Streaming jobs.

Scale notes: all stateful ops key on (window x event_type) or
user_id — bounded or high-cardinality/low-skew state, partitioned by
key across executors. Watermarks bound state size; at 100 TB/day the
same topology runs with kafka sources and RocksDB state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.event_time import instant_to_ntz, with_instant_ts
from searchengine_spark.io import table_path


def read_table_stream(
    spark: SparkSession, sf_dir: str, table: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over any testdata table (schema from a
    static read; nano-long timestamps restored exactly like
    io.load_table). The local stand-in for any append-only table
    feed — every map-only operator (quality gate, fingerprinting,
    quantization) runs on it unchanged."""
    import os

    from searchengine_spark.io import _NANOS_TS_COLS, enable_nanos_long_compat

    # Same flavor tolerance as io.load_table: if the testdata ever
    # carries TIMESTAMP(NANOS) again (it did in driver round 1), read
    # as long-nanos and restore micros below. Only tables with a
    # known nanos-flavored column need the (documented, deliberately
    # session-global) compat flag.
    if table in _NANOS_TS_COLS:
        enable_nanos_long_compat(spark)
    path = table_path(sf_dir, table)
    # Schema from a static footer read, memoized per (session, table):
    # every one of the ~12 bench replays re-ran this driver-side read
    # (r14; each is pure fixed cost on the replay floor).
    from searchengine_spark.io import session_cached

    raw_schema = session_cached(
        spark,
        f"stream-schema:{table}",
        sf_dir,
        lambda: spark.read.parquet(path).schema,
    )
    if os.path.isfile(path):
        # The file stream source requires a directory basePath; a
        # trailing one-char glob class makes Spark treat the parent
        # as basePath while matching exactly this file.
        path = f"{path[:-1]}[{path[-1]}]"
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events table."""
    return read_table_stream(
        spark, sf_dir, "events", max_files_per_trigger=max_files_per_trigger
    )


def read_rate_events_stream(
    spark: SparkSession, *, rows_per_second: int = 500, n_users: int = 50
) -> DataFrame:
    """Unbounded synthetic event stream from the built-in rate source
    — the local stand-in for a Kafka topic (same unbounded-source
    semantics: monotonically growing offsets, per-trigger batches,
    no end). Rate rows (timestamp, value) are mapped deterministically
    to the events schema so every downstream streaming operator
    (rollup, sessionize, dedup, enrich) runs unchanged against it.

    At 100 TB/day the only change is the source line:
    readStream.format("kafka") + from_json(value) — the topology,
    watermarks, and state management are identical.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        # Canonical event time is TIMESTAMP_NTZ (naive UTC) — matches
        # the batch events schema so operators run unchanged.
        instant_to_ntz(F.col("timestamp")).alias("ts"),
        F.pmod(F.col("value"), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]),
            (F.pmod(F.col("value"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 7919, F.lit(10000)) / 100.0).alias("value"),
        F.to_json(F.struct(F.pmod(F.col("value"), F.lit(100)).alias("k"))).alias("props"),
    )


def hourly_rollup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour rollup per event_type (streaming twin of
    relational/events.q_events_hourly).

    Watermarks demand TIMESTAMP_LTZ, so the canonical NTZ event time
    is lifted to the UTC instant first and window bounds are lowered
    back to NTZ on output — batch/stream results stay bit-identical
    in every session time zone."""
    return (
        with_instant_ts(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
        )
        .select(
            instant_to_ntz(F.col("window").start).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hll_rollup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Tumbling rollup carrying an HLL++ distinct-user estimate.

    Exact COUNT(DISTINCT) is not allowed in streaming aggregations
    (it needs unbounded per-group state); approx_count_distinct IS —
    its register-max merge is commutative, so the estimate is
    micro-batch-order independent and the per-group state is the
    fixed ~1.5 KB sketch. This is how a production stream reports
    per-window uniques; the replay query audits the estimate against
    batch truth (rel-err bound), upgrading the combination of
    sketches + watermarked windows to a driver-checked row."""
    return (
        with_instant_ts(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", 0.05).alias("approx_users"),
        )
        .select(
            instant_to_ntz(F.col("window").start).alias("window_start"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def sliding_rollup_stream(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING-window rollup per event_type: each event contributes to
    window/slide overlapping windows (4 here) — the trending-metrics
    shape (e.g. "events in the last hour, refreshed every 15 min").

    Spark implements this by Expand-ing each row into its windows
    map-side, then one keyed shuffle — state size is windows x types,
    independent of input volume. Same NTZ-lift/lower convention as
    hourly_rollup_stream."""
    return (
        with_instant_ts(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
        )
        .select(
            instant_to_ntz(F.col("window").start).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stream(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows per user (streaming sessionization).

    Note: session_window merges on event-time gaps like the batch
    lag/cumsum sessionizer; both emit (user, session) aggregates.
    """
    return (
        with_instant_ts(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("session_value"),
        )
        .select(
            instant_to_ntz(F.col("session_window").start).alias("session_start"),
            instant_to_ntz(F.col("session_window").end).alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event dedup on event_id within the watermark —
    the streaming half of operators/dedup (exact family).

    dropDuplicatesWithinWatermark (not plain dropDuplicates): with
    keys that exclude the event-time column, plain dropDuplicates
    never evicts state — every id ever seen is retained forever. The
    WithinWatermark variant expires ids once they fall behind the
    watermark, bounding state.
    """
    deduped = (
        with_instant_ts(events, "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        deduped = deduped.withColumn("ts", instant_to_ntz(F.col("ts")))
    return deduped


def view_purchase_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    *,
    attribution: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM inner join: attribute each purchase to every view
    by the same user in the preceding ``attribution`` window.

    This is the one stateful-join family in Structured Streaming: both
    sides are watermarked and the join carries an event-time RANGE
    condition, which is what lets Spark bound the join state — a view
    can be evicted once the watermark passes view.ts + attribution,
    a purchase once it passes purchase.ts. Without the range
    condition the state would grow forever. (Public contract:
    Structured Streaming programming guide, stream-stream joins.)

    At 100 TB/day both sides are Kafka topics partitioned by user_id;
    the join keys on user_id so the shuffle co-locates the two
    streams, and state size tracks the attribution horizon, not
    history.
    """
    v = (
        with_instant_ts(views, "ts")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        with_instant_ts(purchases, "ts")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    # how="leftOuter": views with NO attributed purchase also emit
    # (null purchase columns) — but only once the watermark passes
    # view_ts + attribution, when Spark can PROVE no match is coming.
    # That eviction-driven emission is why outer stream-stream joins
    # require both watermarks and the time-range condition.
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution}")
        ),
        how,
    )
    return joined.select(
        "user_id",
        "view_event_id",
        "purchase_event_id",
        instant_to_ntz(F.col("view_ts")).alias("view_ts"),
        instant_to_ntz(F.col("purchase_ts")).alias("purchase_ts"),
        F.round(F.col("purchase_value"), 2).alias("purchase_value"),
    )


def hotkey_events_frame(
    spark: SparkSession,
    *,
    n_events: int,
    hot_user: int = 7,
    hot_every: int = 5,
    spacing_sec: int = 10,
) -> DataFrame:
    """Deterministic SKEWED synthetic event table: every
    ``hot_every``-th event belongs to ONE hot user (1/hot_every of
    total volume); the rest go to distinct cold users. Even event_ids
    are views, odd are purchases, timestamps ``spacing_sec`` apart —
    so cold users never self-match and the stream-stream join's
    entire state and output concentrate on the hot key. This is the
    state-store-skew scenario uniform testdata cannot exercise: on a
    real cluster the hot key's state lands on a single state-store
    partition while every other task idles (tests/test_skew_streaming
    pins correctness; scripts/soak.py records the scaling ratio).
    Same column set/flavor as the testdata events table
    (TIMESTAMP_NTZ micros)."""
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, id * {spacing_sec})")
        ).cast("timestamp_ntz").alias("ts"),
        F.when(F.col("id") % hot_every == 0, F.lit(hot_user))
        .otherwise(F.lit(1_000_000) + F.col("id"))
        .alias("user_id"),
        F.when(F.col("id") % 2 == 0, F.lit("view"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        ((F.col("id") % 9973).cast("double") / F.lit(100.0)).alias("value"),
        F.lit("{}").alias("props"),
    )


def enrich_stream_with_customers(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the event stream with a (slowly
    changing) dimension. Spark broadcasts/replans the static side per
    micro-batch — the standard streaming enrichment shape."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return events.join(dim, "user_id", "left")


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    *,
    output_mode: str,
    shuffle_partitions: int | None = None,
) -> None:
    """Execute a bounded replay to completion into a memory sink.

    ``shuffle_partitions`` sizes the STATE partitioning for this one
    query (state partition count is fixed at query start from
    spark.sql.shuffle.partitions). A stateful op instantiates one
    state store per partition — FOUR per stream-stream join — and
    each store pays per-batch WAL/commit/maintenance regardless of
    how little state it holds, so a bounded replay whose per-partition
    state is tiny is dominated by that fixed cost (measured at sf0.1:
    the left-outer join replay drops 18.5s -> 5-10s going 32 -> 8
    partitions). Callers size it from input rows (replay.py) and the
    conf is restored after the run; production topologies pass None
    and keep the session/cluster setting.
    """
    spark = stream_df.sparkSession
    old = None
    if shuffle_partitions is not None:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        # stop() in finally: a stream exception from
        # processAllAvailable() must not leave the query running and
        # holding the memory sink (ADVICE r12).
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
