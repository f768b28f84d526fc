"""Driver-checkable streaming replays (stream == batch, hash-proved).

Each registry query here replays the events table through a REAL
Structured Streaming topology (file source -> watermarked stateful
operator -> memory sink, availableNow trigger) and returns
the sink contents as a DataFrame. The DuckDB oracle states the batch
semantics — so the driver's hash compare IS the stream/batch parity
argument, upgraded from pytest-only to a hard CORRECTNESS row.

Determinism: availableNow drains the bounded input completely, and
every replay passes a watermark WIDER than the dataset's event-time
span. That matters: a watermark lagging only hours behind max event
time DOES drop late input rows once the replay spans multiple
micro-batches (e.g. a multi-file events table whose files interleave
in time) — stateful ops filter rows older than the watermark, not
just evict state. With the replay-wide horizon nothing is ever late,
so the final output is input-determined regardless of how the source
was micro-batched; the production defaults in streaming/events.py
keep their tight horizons.

Scale: the topologies are exactly the production ones
(streaming/events.py) — swapping the file source for Kafka changes
one line; state is keyed on (window x type) or user_id as described
there.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

from searchengine_spark.streaming.events import (
    dedup_stream,
    hll_rollup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory,
    session_window_stream,
    view_purchase_join_stream,
)

# Memory-sink names must be unique per invocation within a session.
_SINK_SEQ = itertools.count()


def _sink_name(tag: str) -> str:
    return f"replay_{tag}_{next(_SINK_SEQ)}"


# Wider than any testdata time span: no input row can ever be "late"
# during a replay, whatever the file/micro-batch layout.
REPLAY_WATERMARK = "3650 days"

# Target state rows per partition when sizing a bounded replay's
# state partitioning (see run_to_memory's shuffle_partitions doc).
_STATE_ROWS_PER_PARTITION = 25_000


def _replay_partitions(
    spark: SparkSession, sf_dir: str, table: str = "events"
) -> int:
    """State-partition count for a bounded replay, sized from input
    rows: ~_STATE_ROWS_PER_PARTITION state rows per store, floor 8,
    clamped to the session default so a cluster-sized backfill keeps
    its configured parallelism (at 100 TB rows//25k exceeds any
    default and this returns the default unchanged; the one exception
    is a session default BELOW the floor of 8, where the floor wins).
    The row count is parquet-footer metadata — no data scan — and is
    memoized per (session, sf_dir, table) so the ~11 replay queries a
    bench round runs pay it once (ADVICE r12).

    Round-12 adjudication of the left-join-replay drift: per-batch
    state-store fixed costs (4 stores x partitions per stream-stream
    join, each with WAL+commit+maintenance) dominated the replay at
    32 partitions with only ~1.2k state rows per store; 8 partitions
    measured 1.9-3.8x faster at sf0.1 (BENCH_COMPARE_r12.md).
    """
    from searchengine_spark.io import session_cached

    n = session_cached(
        spark,
        f"replay-rowcount:{table}",
        sf_dir,
        lambda: load_table(spark, sf_dir, table).count(),
    )
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(8, min(n // _STATE_ROWS_PER_PARTITION, default))


def q_stream_hourly_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup, replayed to completion."""
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("hourly")
    run_to_memory(
        hourly_rollup_stream(stream, watermark=REPLAY_WATERMARK),
        name,
        output_mode="complete",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name)


def q_stream_hll_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed HLL++ uniques inside a watermarked streaming agg,
    audited against batch truth: exact n_events/n_users hash-check
    directly; the stream's sketch estimate enters as an error-bound
    boolean (same convention as operators/approx.py — engine-specific
    estimates can't hash cross-engine, their error bound can).

    Per-window cardinalities are SMALL (3-300 users), where rsd is a
    poor yardstick: HLL++'s integer estimates are routinely off by 1
    at n<10 (rel-err 0.33) and the measured worst across sf0.001-0.1
    is abs-diff 4 / rel-err 0.167 (n=24). Bound: abs-diff <=
    greatest(2, 0.3*n) — ~2x worst measured on both axes, still tight
    enough that a broken sketch (or a window that lost rows) trips
    it."""
    from searchengine_spark.streaming.events import with_instant_ts, instant_to_ntz

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("hll")
    run_to_memory(
        hll_rollup_stream(stream, watermark=REPLAY_WATERMARK),
        name,
        output_mode="complete",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    from searchengine_spark.io import load_table

    # Persisted: the audit join pushes IsNotNull(window_start) into
    # this side, and without a barrier the pushdown SUBSTITUTES the
    # whole window-start derivation (instant lift -> window -> NTZ
    # lower, with make_timestamp_ntz re-deriving it per datetime
    # field) into the scan-stage filter — a several-thousand-node
    # expression evaluated per input row (measured: the join step
    # alone cost 15-37s at sf0.1 vs ~2s for the aggregate itself;
    # same pathology class as the shingle_frame pushdown note). The
    # persist plans the pushed filter against the |windows x types|
    # cached output instead.
    exact = (
        with_instant_ts(load_table(spark, sf_dir, "events"), "ts")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            instant_to_ntz(F.col("window").start).alias("window_start"),
            "event_type",
            "n_users",
        )
        .persist()
    )
    return (
        spark.table(name)
        .join(exact, ["window_start", "event_type"])
        .select(
            "window_start",
            "event_type",
            "n_events",
            "n_users",
            (
                F.abs(F.col("approx_users") - F.col("n_users"))
                <= F.greatest(F.lit(2.0), F.col("n_users") * 0.3)
            ).alias("users_err_ok"),
        )
    )


def q_stream_session_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session_window (30 min gap), replayed."""
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("sessions")
    run_to_memory(
        session_window_stream(stream, watermark=REPLAY_WATERMARK),
        name,
        output_mode="complete",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name).select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("session_value", 6).alias("session_value"),
    )


def q_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on event_id; the testdata ids are
    unique, so the replay must reproduce the events table EXACTLY —
    any row the watermark machinery dropped or duplicated flips the
    hash. The replay-wide watermark is what makes that claim hold for
    ANY micro-batching of the source (see module docstring)."""
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("dedup")
    run_to_memory(
        dedup_stream(stream, watermark=REPLAY_WATERMARK),
        name,
        output_mode="append",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def q_stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keyed state (applyInPandasWithState) replayed to
    completion. Update mode emits one row per (user, micro-batch);
    n_events is strictly increasing per user, so the lexicographic
    max struct per user IS the final state — independent of how the
    replay was micro-batched — and must equal the batch per-user
    totals the oracle states."""
    from searchengine_spark.streaming.stateful import user_running_totals

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("stateful")
    run_to_memory(
        user_running_totals(stream),
        name,
        output_mode="update",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "last_seen_us")).alias("s"))
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.round("s.total_value", 2).alias("total_value"),
        F.col("s.last_seen_us").alias("last_seen_us"),
    )


def q_stream_view_purchase_join_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (view -> purchase
    attribution), replayed to completion. Two independent file-source
    streams over the same events table; the inner join with an
    event-time range condition is the stateful-join topology — with
    the replay-wide watermark no row is late, so the append-mode
    output must equal the batch interval join the oracle states."""
    views = read_events_stream(spark, sf_dir, max_files_per_trigger=8).filter(
        F.col("event_type") == "view"
    )
    purchases = read_events_stream(
        spark, sf_dir, max_files_per_trigger=8
    ).filter(F.col("event_type") == "purchase")
    name = _sink_name("vpjoin")
    run_to_memory(
        view_purchase_join_stream(
            views, purchases, watermark=REPLAY_WATERMARK
        ),
        name,
        output_mode="append",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name)


def q_stream_view_purchase_left_join_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked LEFT-OUTER stream-stream join replay: every view
    emits — matched views with their attributed purchases, unmatched
    views with null purchase columns once the watermark PROVES no
    match can arrive.

    Outer emission is eviction-driven, which makes replay-to-parity
    subtle: null rows for trailing views only flush when the
    watermark advances PAST view_ts + attribution, and a bounded
    replay's watermark stops at max(event_ts) - delay. So the replay
    plants a far-future WATERMARK SENTINEL (one view + one purchase
    for reserved user_id -1, +240 h/+480 h past the data, mutually
    outside the attribution window) in the streamed directory: all
    real data processes in batch 1 (nothing is ever late — the
    watermark is still at its initial floor), the sentinel lifts the
    final watermark past every eviction threshold, and the trailing
    no-data batch flushes the unmatched state. The sentinel user is
    filtered from the result; the oracle is the plain batch LEFT
    JOIN. This is exactly how a production pipeline closes the books
    on a bounded backfill through a streaming topology.
    """
    import os
    import tempfile

    from pyspark.sql.types import LongType

    from searchengine_spark.io import table_path

    src = table_path(sf_dir, "events")
    raw = spark.read.parquet(src)
    hours = 3600 * 10**9  # nanos per hour (long-ts flavor)
    if isinstance(raw.schema["ts"].dataType, LongType):
        shift = lambda h: F.col("ts") + F.lit(h * hours)  # noqa: E731
    else:
        shift = lambda h: F.col("ts") + F.expr(f"INTERVAL {h} HOURS")  # noqa: E731
    last = raw.orderBy(F.desc("ts")).limit(1)
    sentinel = last.select(
        F.lit(-1).cast("bigint").alias("event_id"),
        shift(240).alias("ts"),
        F.lit(-1).cast("bigint").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).union(
        last.select(
            F.lit(-2).cast("bigint").alias("event_id"),
            shift(480).alias("ts"),
            F.lit(-1).cast("bigint").alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="replay_ljoin_")

    # The events table may be a single parquet file (driver testdata)
    # or a Spark-written DIRECTORY of part files (soak's scaled
    # copies); hard-link what we can, copy across devices.
    def _link_or_copy(s: str, d: str) -> None:
        import shutil

        try:
            os.link(s, d)
        except OSError:
            shutil.copyfile(s, d)

    if os.path.isdir(src):
        parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        for i, f in enumerate(parts):
            _link_or_copy(os.path.join(src, f), os.path.join(tmp, f"data-{i}.parquet"))
    else:
        _link_or_copy(src, os.path.join(tmp, "data-0.parquet"))
    sentinel.coalesce(1).write.mode("append").parquet(tmp)

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 10_000)  # one batch: nothing late
        .parquet(tmp)
    )
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    name = _sink_name("vpleftjoin")
    run_to_memory(
        view_purchase_join_stream(
            views, purchases, watermark="1 second", how="leftOuter"
        ),
        name,
        output_mode="append",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name).filter(F.col("user_id") >= 0)


def q_stream_rollup_ivm_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch IVM topology (streaming/rollup_stream.py)
    replayed to completion. Unlike the pure windowed-agg streaming
    rollup — whose oracle must DROP n_users because exact distinct is
    unsupported in an incremental windowed aggregation — the IVM's
    distinct-keys companion view delivers EXACT COUNT DISTINCT from a
    stream, so this oracle is the complete batch rollup."""
    import tempfile

    from searchengine_spark.streaming.rollup_stream import (
        read_rollup,
        start_rollup_maintenance,
    )

    out = tempfile.mkdtemp(prefix="rollup_ivm_")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    # Same bounded-replay sizing as run_to_memory: the foreachBatch
    # body's per-batch aggregations are tiny here.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_replay_partitions(spark, sf_dir)),
    )
    try:
        q = start_rollup_maintenance(
            stream, out, checkpoint_dir=tempfile.mkdtemp(prefix="rollup_ckpt_")
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return read_rollup(spark, out)


def q_stream_sliding_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1 h window / 15 min slide) rollup replay —
    each event lands in exactly 4 overlapping windows."""
    from searchengine_spark.streaming.events import sliding_rollup_stream

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    name = _sink_name("sliding")
    run_to_memory(
        sliding_rollup_stream(stream, watermark=REPLAY_WATERMARK),
        name,
        output_mode="complete",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name)


def q_stream_enriched_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment then a watermarked rollup: the event
    stream left-joins the customer dimension (user_id -> market
    segment; the static side is re-planned per micro-batch, broadcast
    when small — the standard streaming enrichment shape), then rolls
    up hourly per segment. Events with no matching customer keep a
    NULL segment — the oracle's LEFT JOIN states exactly that."""
    from searchengine_spark.event_time import instant_to_ntz, with_instant_ts
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import enrich_stream_with_customers

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    enriched = enrich_stream_with_customers(
        stream, load_table(spark, sf_dir, "customer")
    )
    rolled = (
        with_instant_ts(enriched, "ts")
        .withWatermark("ts", REPLAY_WATERMARK)
        .groupBy(F.window("ts", "1 hour"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            instant_to_ntz(F.col("window").start).alias("window_start"),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )
    name = _sink_name("enriched")
    run_to_memory(
        rolled,
        name,
        output_mode="complete",
        shuffle_partitions=_replay_partitions(spark, sf_dir),
    )
    return spark.table(name)


# Deterministic arrival split for the streaming near-dup replay: md5
# bucket 0 of STREAM_ND_MOD (~20% of documents) ARRIVES as the
# stream; the rest is the already-indexed corpus whose band table is
# the static join side.
STREAM_ND_SALT = "streamnd"
STREAM_ND_MOD = 5


def q_stream_neardup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup matching inside Structured Streaming: each
    arriving micro-batch is tokenized/shingled/banded with the SAME
    map-only expressions as the batch path (dedup.minhash_bands runs
    unchanged on a streaming frame — the stage barrier degrades to an
    in-batch Exchange), then stream-static joined against the
    persisted corpus band table, capped corpus-side by the standard
    hot-bucket guard. dropDuplicates collapses multi-band matches of
    the same pair. This is the ingest-time contamination/dup check at
    100 TB: band index persisted once, each arriving batch pays
    O(batch) banding + an equi-join on the uniform band hash; in
    production the dedup state is bounded with
    dropDuplicatesWithinWatermark on ingest time (the replay's
    bounded input needs no eviction).

    The DuckDB oracle states the batch semantics (band everything,
    split, cap, join) — the hash compare IS the stream/batch parity
    proof, same convention as every replay here."""
    from searchengine_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        minhash_bands,
        session_bands,
    )
    from searchengine_spark.operators.sampling import hash_bucket
    from searchengine_spark.streaming.events import read_table_stream

    is_new = (
        hash_bucket(F.col("doc_id"), n_buckets=STREAM_ND_MOD, salt=STREAM_ND_SALT)
        == 0
    )
    # The static side reads the session-shared corpus band cache
    # restricted to the already-indexed split: band signatures are a
    # per-doc pure function of the doc's text, and the arrival split
    # is keyed on doc_id alone, so bands(corpus minus arrivals) ==
    # bands(corpus) filtered by the same doc_id predicate — one corpus
    # band build per session instead of one per replay (guide §1.2
    # step 1; same restriction argument as the pipeline near-dup
    # stages). The bucket-size cap below still runs on the restricted
    # set, exactly as before.
    cb = session_bands(spark, sf_dir).filter(~is_new)
    keep = (
        cb.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") <= DEFAULT_MAX_BUCKET)
        .select("band", "band_hash")
    )
    static_bands = (
        cb.join(keep, ["band", "band_hash"], "left_semi")
        .select(F.col("doc_id").alias("c_id"), "band", "band_hash")
        .cache()
    )
    static_bands.count()  # materialize ONCE; micro-batches re-join it
    try:
        stream = read_table_stream(
            spark, sf_dir, "documents", max_files_per_trigger=1
        ).filter(is_new)
        nb = minhash_bands(stream).select(
            F.col("doc_id").alias("n_id"), "band", "band_hash"
        )
        pairs = (
            nb.join(static_bands, ["band", "band_hash"])
            .select(
                F.least("n_id", "c_id").alias("doc_a"),
                F.greatest("n_id", "c_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        name = _sink_name("neardup")
        run_to_memory(
            pairs,
            name,
            output_mode="append",
            shuffle_partitions=_replay_partitions(spark, sf_dir, "documents"),
        )
        return spark.table(name)
    finally:
        static_bands.unpersist()


def _stream_neardup_sql() -> str:
    from searchengine_spark.operators.dedup import DEFAULT_MAX_BUCKET, _BANDS_CTE

    pred = (
        f"(('0x' || substr(md5('{STREAM_ND_SALT}' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15))::BIGINT % {STREAM_ND_MOD}) = 0"
    )
    return f"""{_BANDS_CTE},
nb AS (SELECT doc_id, band, band_hash FROM bands WHERE {pred}),
cb AS (SELECT doc_id, band, band_hash FROM bands WHERE NOT ({pred})),
keepb AS (
  SELECT band, band_hash FROM cb
  GROUP BY band, band_hash HAVING COUNT(*) <= {DEFAULT_MAX_BUCKET}
),
cbk AS (SELECT cb.* FROM cb JOIN keepb USING (band, band_hash))
SELECT DISTINCT LEAST(n.doc_id, c.doc_id) AS doc_a,
                GREATEST(n.doc_id, c.doc_id) AS doc_b
FROM nb n JOIN cbk c USING (band, band_hash)
"""


def q_stream_topk_leaderboard_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch leaderboard topology (streaming/leaderboard.py)
    replayed to completion: per-hour top-K users by event count,
    maintained incrementally. The hard part of a streaming ranked
    view is that any batch can promote any key; the topology keeps
    the per-(hour, user) sufficient statistics as insert-only,
    retry-deduped partials and derives the ranked view at read time
    with the pruned bucket-prefix-sum rank — so the oracle is the
    plain batch top-K over all events, ties broken on user_id."""
    import tempfile

    from searchengine_spark.streaming.leaderboard import (
        read_leaderboard,
        start_leaderboard_maintenance,
    )

    out = tempfile.mkdtemp(prefix="leaderboard_")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=8)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_replay_partitions(spark, sf_dir)),
    )
    try:
        q = start_leaderboard_maintenance(
            stream, out, checkpoint_dir=tempfile.mkdtemp(prefix="lb_ckpt_")
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return read_leaderboard(spark, out)


QUERIES = {
    "stream_hourly_rollup_replay": q_stream_hourly_rollup_replay,
    "stream_topk_leaderboard_replay": q_stream_topk_leaderboard_replay,
    "stream_enriched_rollup_replay": q_stream_enriched_rollup_replay,
    "stream_sliding_rollup_replay": q_stream_sliding_rollup_replay,
    "stream_rollup_ivm_replay": q_stream_rollup_ivm_replay,
    "stream_view_purchase_join_replay": q_stream_view_purchase_join_replay,
    "stream_view_purchase_left_join_replay": q_stream_view_purchase_left_join_replay,
    "stream_hll_rollup_replay": q_stream_hll_rollup_replay,
    "stream_session_window_replay": q_stream_session_window_replay,
    "stream_dedup_replay": q_stream_dedup_replay,
    "stream_stateful_user_totals": q_stream_stateful_user_totals,
    "stream_neardup_replay": q_stream_neardup_replay,
}

ORACLES = {
    # Batch semantics of the maintained top-K leaderboard: hourly
    # per-user counts over ALL events, ranked with the same
    # deterministic tie-break the read side uses.
    "stream_topk_leaderboard_replay": """
        WITH counts AS (
          SELECT (epoch_us(ts) // 1000000) // 3600 AS hour_idx, user_id,
                 count(*)::BIGINT AS n_events
          FROM events GROUP BY 1, 2
        ),
        ranked AS (
          SELECT hour_idx, user_id, n_events,
                 row_number() OVER (PARTITION BY hour_idx
                   ORDER BY n_events DESC, user_id ASC) AS rank
          FROM counts
        )
        SELECT hour_idx, CAST(rank AS BIGINT) AS rank, user_id, n_events
        FROM ranked WHERE rank <= 3
    """,
    # Batch semantics of the streaming band-match: band the whole
    # corpus, split into arriving/indexed, cap hot buckets on the
    # indexed side, equi-join — the stream/batch parity proof for
    # ingest-time near-dup.
    "stream_neardup_replay": _stream_neardup_sql(),
    # Batch semantics of the stream-stream interval join: every
    # (view, purchase) pair per user with the purchase inside the
    # 1-hour attribution window after the view.
    "stream_view_purchase_join_replay": """
        SELECT v.user_id,
               v.event_id AS view_event_id,
               p.event_id AS purchase_event_id,
               v.ts AS view_ts,
               p.ts AS purchase_ts,
               ROUND(p.value, 2) AS purchase_value
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    # LEFT-OUTER batch semantics: every view, with its attributed
    # purchases or nulls. The streaming side's sentinel rows carry
    # user_id -1 and are filtered before the compare.
    "stream_view_purchase_left_join_replay": """
        SELECT v.user_id,
               v.event_id AS view_event_id,
               p.event_id AS purchase_event_id,
               v.ts AS view_ts,
               p.ts AS purchase_ts,
               ROUND(p.value, 2) AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    # Batch semantics of the tumbling rollup — identical to the
    # events_hourly_rollup oracle minus n_users (the streaming twin
    # does not countDistinct: exact distinct aggregation is
    # unsupported in an incremental windowed agg; HLL sketches are
    # the streaming answer, covered by operators/approx).
    "stream_hourly_rollup_replay": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # Exact halves of the streaming-HLL audit; the estimate's error
    # bound enters as an oracle-stated TRUE (operators/approx.py
    # convention).
    "stream_hll_rollup_replay": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               TRUE AS users_err_ok
        FROM events
        GROUP BY 1, 2
    """,
    # Batch semantics of the stream-static enrichment rollup: the
    # LEFT JOIN keeps unmatched users under a NULL segment.
    "stream_enriched_rollup_replay": """
        SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    # Sliding windows in batch SQL: every event belongs to the 4
    # windows starting at its 15-min bucket minus k*15min, k=0..3
    # (window 1 h, slide 15 min => ts < start + 1 h holds for all 4).
    "stream_sliding_rollup_replay": """
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k.range * INTERVAL '15 minutes' AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        FROM events, range(4) k
        GROUP BY 1, 2
    """,
    # The IVM replay recovers the FULL rollup contract — including
    # the exact distinct-user count the windowed-agg twin cannot do.
    "stream_rollup_ivm_replay": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    # Gap-based sessions: an event exactly `gap` after the previous
    # one opens a NEW session (windows are [start, last_ts + gap)),
    # hence >=. session_end = last event + gap, per session_window.
    "stream_session_window_replay": f"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                      WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessioned AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS sid
          FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 6) AS session_value
        FROM sessioned
        GROUP BY user_id, sid
    """,
    "stream_dedup_replay": """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
    """,
    # Final keyed state == batch totals. total_value is cents-exact in
    # both engines (2-decimal inputs; the state accumulator rounds to
    # cents per micro-batch).
    "stream_stateful_user_totals": """
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 2) AS total_value,
               MAX(epoch_us(ts)) AS last_seen_us
        FROM events
        GROUP BY user_id
    """,
}
