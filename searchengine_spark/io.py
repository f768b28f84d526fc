"""Table loading helpers.

All inputs are parquet directories/files named `<table>.parquet`
under a scale-factor dir (see TESTDATA.md). Reads are plain
`spark.read.parquet` so Catalyst gets full pushdown/pruning; no
schema is imposed (parquet carries it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The synthetic documents corpus draws from this closed 31-word
# vocabulary at every scale factor (verified identical across
# sf0.001/0.01/0.1). Stem-dictionary oracles are generated from it;
# they fail LOUDLY (DuckDB error()) on any word outside the list, so
# a vocabulary drift in regenerated testdata surfaces as an oracle
# error, never a silent pass (see porter.sql_stem_case_expr).
TESTDATA_DOC_VOCAB: tuple[str, ...] = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def int_array_lit(values, cast_type: str):
    """Nested list of ints -> ONE (possibly nested) array literal
    Column, rendered as SQL text and parsed in a single py4j call.

    `F.lit(nested_list)` converts element-by-element over py4j at
    ~0.65 ms/element on this class of host (measured r14: a 16k-entry
    ADC table literal cost 10.6 s of pure driver time BEFORE any job
    started; the 1k-entry PQ codebook literal 1.3 s per use). The SQL
    text round-trip costs ~40 ms for the same 16k elements, and the
    optimizer constant-folds the parsed CreateArray tree to the
    identical Literal the F.lit path yields (column-compared equal).
    ``cast_type`` is the exact array<...> type string the old
    ``F.lit(...).cast(...)`` call used, so expression types are
    unchanged."""
    from pyspark.sql import functions as F

    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(v) for v in x) + ")"
        return f"{int(x)}L"

    return F.expr(render(values)).cast(cast_type)


# Columns stored as parquet TIMESTAMP(NANOS); Spark reads them as
# long nanos (spark.sql.legacy.parquet.nanosAsLong) and we restore a
# microsecond TIMESTAMP here. Floor-division truncation matches what
# a microsecond engine (DuckDB) sees.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def enable_nanos_long_compat(spark: SparkSession) -> None:
    """INTENTIONALLY SESSION-GLOBAL: flip the runtime-settable
    `spark.sql.legacy.parquet.nanosAsLong` flag so parquet
    TIMESTAMP(NANOS) columns (driver round-1 testdata flavor) load as
    long-nanos instead of being rejected by the vectorized reader.

    Session-global is the point, not an accident: the grading driver
    may hand us a session our factory didn't build, and the flag must
    hold for every read of a nanos-flavored table in it. The blast
    radius is nil for other reads — the flag only changes how a type
    Spark otherwise refuses to read is surfaced, and every caller
    here immediately restores microsecond timestamps. Centralized so
    no reader helper mutates session conf as an undocumented side
    effect (round-3 advice)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name in _NANOS_TS_COLS:
        enable_nanos_long_compat(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # Integer `div`, NOT `/`: float division of e18-scale nanos
            # exceeds double precision and lands ±1µs off.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition ONLY if the scan produced fewer partitions than
    cores — rescues CPU-bound map stages over small single-row-group
    files (local test data). At real scale a 100 TB scan already has
    thousands of splits, so this is a no-op and never forces a
    full-corpus shuffle.
    """
    if df.isStreaming:
        # Partition introspection (df.rdd) is illegal on a streaming
        # frame; micro-batch sizing is the trigger's job. Map-only
        # operators built on this helper stay streaming-compatible.
        return df
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exchange_barrier(df: DataFrame) -> DataFrame:
    """Materialization barrier between projection stages.

    CollapseProject re-inlines an aliased expression into every
    reference site of the next projection — for chained text ops
    (tokenize -> shingle/chunk/hash) that re-evaluates the expensive
    upstream expression per element. An Exchange is a hard boundary:
    upstream computes once, downstream lambdas read materialized
    arrays. The shuffled payload is token/int arrays (same order of
    size as the input) — fine at interactive scale; for build-scale
    runs use :func:`materialize_barrier` with a persist_dir, which
    achieves the same boundary with a map-only parquet write + scan
    instead of an all-to-all shuffle of the token stream.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def default_persist_dir() -> str | None:
    """Build-scale opt-in: when $SPARK_GRAFT_PERSIST_DIR is set, the
    shingle/text family routes its stage barriers through persisted
    parquet intermediates instead of full shuffles."""
    return os.environ.get("SPARK_GRAFT_PERSIST_DIR") or None


_BARRIER_SEQ = __import__("itertools").count()


def materialize_barrier(
    df: DataFrame, persist_dir: str | None = None, *, tag: str = "stage"
) -> DataFrame:
    """Stage barrier with a scale-safe materialization strategy.

    With ``persist_dir``: write the stage output to
    ``persist_dir/<tag>-<n>`` (map-only — each task writes its own
    partitions, NO corpus-wide Exchange) and return a fresh scan of
    it. Treat persist_dir as a per-run scratch workspace; to REUSE an
    intermediate across queries, pass the returned frame along (e.g.
    the ``shingles=`` parameter of the dedup family) rather than
    relying on paths.

    Without ``persist_dir``: fall back to :func:`exchange_barrier`
    (in-memory shuffle barrier) — right for interactive/test scale
    where writing a temp table per query would dominate.

    The ``<n>`` suffix is a session-unique counter: the returned
    frame is a LAZY scan, so two barrier calls sharing a path would
    let the second call's overwrite silently corrupt the first's
    pending reads (e.g. the incremental-dedup query banding the
    corpus and then the new batch).
    """
    if df.isStreaming:
        # A streaming frame cannot batch-write an intermediate; the
        # Exchange barrier gives the same CollapseProject boundary
        # inside each micro-batch (used by the streaming near-dup
        # topology, whose micro-batches are batch-sized anyway).
        return exchange_barrier(df)
    if persist_dir is None:
        return exchange_barrier(df)
    path = os.path.join(persist_dir, f"{tag}-{next(_BARRIER_SEQ)}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every known table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eager lineage cut: localCheckpoint by default, a RELIABLE
    checkpoint under $SPARK_GRAFT_PERSIST_DIR when set (the
    cluster-grade opt-in — localCheckpoint blocks do not survive
    executor loss; see operators/dedup._cut_lineage, which this
    replaces as the shared implementation).

    Beyond iterative loops, this is the r14 session-cache policy: a
    `.cache()`d shared stage KEEPS its full analyzed plan, and every
    downstream persist/cache-lookup/AQE step re-canonicalizes that
    subtree — with the MinHash band pipeline (128 signature
    expressions) as the cached child, the graph family measured
    5-8 s of pure driver time per query against a ~500-row graph;
    cutting the lineage at the cache boundary took the same BFS from
    8.1 s to 1.2 s and its re-consume from 4.0 s to 0.08 s (drill,
    equal calib). The cut frame is a LogicalRDD leaf: planning cost
    downstream becomes independent of how the shared stage was
    derived, at any scale."""
    persist = default_persist_dir()
    if persist:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(os.path.join(persist, "cc-checkpoints"))
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def cut_and_release(df: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Eagerly cut ``df``'s lineage, then unpersist the persisted
    ``intermediates`` that only existed to build it (r14
    persist-hygiene sweep / r13 ADVICE: library operators that
    persist() scratch frames with no handle pin MEMORY_AND_DISK
    blocks for the session on every call outside the session-cached
    registry path). The cut materializes the result first, so the
    releases cannot force a recompute."""
    out = cut_lineage(df)
    for frame in intermediates:
        frame.unpersist()
    return out


_SESSION_CACHE: dict[tuple, object] = {}
_SESSION_CACHE_MAX = 64


def session_cached(spark: SparkSession, tag: str, sf_dir: str, build):
    """Get-or-build a per-(session, dataset) memoized value (a cached
    DataFrame lineage, typically). One shared implementation for the
    index / shingle / signature caches.

    Key = (applicationId, id(session), tag, sf_dir):
    - applicationId separates restarted contexts (a stopped context's
      cached DataFrames are unusable — id() alone could be reused by
      a new session object at the same address);
    - id(session) separates newSession() siblings sharing one context
      (they can differ in conf/catalog); the cached value holds a
      reference to its session, so that id cannot be recycled while
      the entry exists.
    The dict is cleared when it exceeds a bound — entries for dead
    contexts are unreachable garbage, and rebuilds are lazy, so a
    blanket clear is safe and keeps long-lived drivers bounded.
    """
    key = (spark.sparkContext.applicationId, id(spark), tag, sf_dir)
    val = _SESSION_CACHE.get(key)
    if val is None:
        if len(_SESSION_CACHE) > _SESSION_CACHE_MAX:
            _SESSION_CACHE.clear()
        val = build()
        _SESSION_CACHE[key] = val
    return val
