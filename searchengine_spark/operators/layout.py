"""Data-layout operators: Z-order clustering for multi-dim skipping.

Parquet data skipping is row-group min/max pruning: a filter skips a
row group iff the predicate can't be true inside the group's [min,
max]. Sorting by ONE column makes its ranges tight and every other
column's ranges full-width; a 100 TB table queried by BOTH user_id
and time (or brand and size) needs a layout where every sorted-on
dimension's ranges are narrow. Z-ordering delivers that: sort by the
bit-interleave of the (rank-normalized) dimensions, so row groups
become hypercubes in dimension space instead of slabs.

All Column arithmetic (shifts/masks in whole-stage codegen) — no
UDF, no shuffle beyond the final range-partitioning sort that any
clustered write pays. Rank normalization uses ntile so arbitrary
value distributions (skewed, negative, sparse) spread uniformly
across the curve.

This is a WRITE-TIME layout choice, verified by reading back parquet
footers (tests/test_layout.py measures row groups pruned for 2-dim
point queries: z-ordered ~sqrt(N) touched vs slab layouts' N).
Delta/Iceberg expose the same thing as OPTIMIZE ZORDER BY; this is
the engine-level mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit key


def _spread_bits(col: Column, bits: int = ZBITS) -> Column:
    """Insert a 0 between consecutive bits of a `bits`-wide int
    (classic morton spread, log-steps with shift/mask Columns)."""
    x = col.cast("bigint")
    # magic-number spread for 16 -> 32 bits, applied in 4 log-steps
    # (NB: Column `|`/`&` are LOGICAL or/and — bitwise needs the
    # explicit bitwiseOR/bitwiseAND methods)
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def zorder_key(a: Column, b: Column, *, bits: int = ZBITS) -> Column:
    """Morton interleave of two ALREADY-NORMALIZED ints in
    [0, 2^bits)."""
    return _spread_bits(a, bits).bitwiseOR(F.shiftleft(_spread_bits(b, bits), 1))


def with_zorder_rank_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = ZBITS,
    key_col: str = "_zkey",
    exact: bool = True,
) -> DataFrame:
    """Add a z-key over the RANK of each dimension — distribution-
    free, handles negatives/skew/floats.

    ``exact=True``: ntile windows — a GLOBAL sort per dimension.
    Deterministic (tests) but single-task at the merge; use for
    datasets that fit a sort.
    ``exact=False``: the 100 TB path — approxQuantile cutpoints
    (one sampled aggregate per dimension, no global sort) baked into
    the plan as a literal bucket boundary array searched per-row.
    Z-order quality degrades gracefully with quantile error: a
    slightly-off boundary only blurs tile edges.
    """
    if not exact:
        # Rank resolution beyond ~row-group granularity buys nothing
        # (tiles are row-group sized); clamp so the in-plan cutpoint
        # array and the per-row comparisons stay small.
        bits = min(bits, 10)
    n = 1 << bits
    if not exact:
        eps = 1.0 / (4 * n)
        out = df
        for c, tmp in ((col_a, "_za"), (col_b, "_zb")):
            cuts = df.selectExpr(f"cast({c} as double) as _v").approxQuantile(
                "_v", [i / n for i in range(1, n)], eps
            )
            arr = F.array(*[F.lit(float(x)) for x in cuts])
            # bucket = #cutpoints strictly below the value (binary
            # search would need a UDF; filter+size is codegen-able
            # and the array is in-plan constant)
            out = out.withColumn(
                tmp,
                F.size(F.filter(arr, lambda x: x <= F.col(c).cast("double"))),
            )
        return out.withColumn(
            key_col, zorder_key(F.col("_za"), F.col("_zb"), bits=bits)
        ).drop("_za", "_zb")

    from pyspark.sql import Window

    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    return (
        df.withColumn("_za", F.ntile(n).over(wa) - 1)
        .withColumn("_zb", F.ntile(n).over(wb) - 1)
        .withColumn(key_col, zorder_key(F.col("_za"), F.col("_zb"), bits=bits))
        .drop("_za", "_zb")
    )


def write_clustered(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    n_files: int = 0,
    block_size_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Write parquet range-clustered on ``sort_cols``: global order
    across files (repartitionByRange) + order within files, so the
    row-group stats (one group per ``block_size_bytes``) are tight on
    the sort key. Default block size is the parquet production
    default; tests shrink it to force many groups at toy scale."""
    n_files = n_files or max(df.sparkSession.sparkContext.defaultParallelism // 4, 1)
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.option("parquet.block.size", block_size_bytes)
        .mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = ZBITS,
    n_files: int = 0,
    block_size_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Write parquet clustered on the z-curve of (col_a, col_b); the
    key column is dropped — the LAYOUT is the artifact, not the key."""
    keyed = with_zorder_rank_key(df, col_a, col_b, bits=bits)
    n_files = n_files or max(df.sparkSession.sparkContext.defaultParallelism // 4, 1)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.option("parquet.block.size", block_size_bytes)
        .mode("overwrite")
        .parquet(path)
    )


def q_layout_zorder_keys(spark, sf_dir: str) -> DataFrame:
    """Z-order key assignment over orders (o_custkey × o_totalprice):
    the exact write-time clustering key `write_zordered` sorts by,
    surfaced as a query so the driver can hash-prove the morton
    arithmetic end-to-end against a DuckDB twin.

    Deterministic variant of `with_zorder_rank_key`'s exact path: the
    ntile windows tie-break on o_orderkey (a bare ORDER BY on a
    non-unique column would make bucket assignment order-dependent).
    8 bits/dim keeps tiles row-group-grained; the shifts/masks run in
    whole-stage codegen.
    """
    from pyspark.sql import Window

    from searchengine_spark.io import load_table

    bits = 8
    n = 1 << bits
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    wa = Window.orderBy(F.col("o_custkey"), F.col("o_orderkey"))
    wb = Window.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.withColumn("za", (F.ntile(n).over(wa) - 1).cast("bigint"))
        .withColumn("zb", (F.ntile(n).over(wb) - 1).cast("bigint"))
        .select(
            "o_orderkey",
            "za",
            "zb",
            zorder_key(F.col("za"), F.col("zb"), bits=bits).alias("zkey"),
        )
        .orderBy("zkey", "o_orderkey")
    )


# Morton spread masks as decimal literals (DuckDB's 0x parsing is not
# portable): 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
# 0x3333333333333333, 0x5555555555555555.
_ZORDER_SQL = """
WITH ranked AS (
  SELECT o_orderkey,
         CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS za,
         CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS zb
  FROM orders
), s1 AS (
  SELECT o_orderkey, za, zb,
         (za | (za << 8)) & 71777214294589695 AS sa,
         (zb | (zb << 8)) & 71777214294589695 AS sb
  FROM ranked
), s2 AS (
  SELECT o_orderkey, za, zb,
         (sa | (sa << 4)) & 1085102592571150095 AS sa,
         (sb | (sb << 4)) & 1085102592571150095 AS sb
  FROM s1
), s3 AS (
  SELECT o_orderkey, za, zb,
         (sa | (sa << 2)) & 3689348814741910323 AS sa,
         (sb | (sb << 2)) & 3689348814741910323 AS sb
  FROM s2
), s4 AS (
  SELECT o_orderkey, za, zb,
         (sa | (sa << 1)) & 6148914691236517205 AS sa,
         (sb | (sb << 1)) & 6148914691236517205 AS sb
  FROM s3
)
SELECT o_orderkey, za, zb, CAST(sa | (sb << 1) AS BIGINT) AS zkey
FROM s4
ORDER BY zkey, o_orderkey
"""


# ------------------------------------------- distributed footer manifest

N_LAYOUT_BUCKETS = 8


def footer_stats_manifest(spark, files: list[str], key_col: str) -> DataFrame:
    """Per-file (path, n_rows, key_min, key_max) collected from
    parquet FOOTERS ONLY, as a DISTRIBUTED job: the file list is a
    DataFrame and each executor reads its partition's footers via
    pyarrow inside mapInPandas. This is the manifest-build step
    itself at scale — a 100 TB table has ~10^5-10^6 files, so stats
    collection (Delta's `CONVERT TO DELTA`, Iceberg's
    `add_files`/migrate) must be a cluster job, not the driver loop
    `sources/versioned.py:_file_stats` uses for its per-commit
    handful of files. Arrow-batched; one footer read (~KB) per file,
    never the data pages."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    paths = spark.createDataFrame([(f,) for f in files], "path string")

    def scan(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                idx = md.schema.to_arrow_schema().get_field_index(key_col)
                lo = hi = None
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                out.append((p, md.num_rows, lo, hi))
            yield pd.DataFrame(
                out, columns=["path", "n_rows", "key_min", "key_max"]
            )

    return paths.repartition(max(1, min(len(files), 32))).mapInPandas(
        scan, "path string, n_rows long, key_min long, key_max long"
    )


def q_layout_footer_stats(spark, sf_dir: str) -> DataFrame:
    """End-to-end manifest build: lineitem is written as a
    deterministic 8-bucket partitioned layout (md5 bucket of
    l_orderkey; one shuffle task per bucket so each bucket is exactly
    one file), then the manifest is collected from footers only by
    the distributed scanner and rolled up per bucket. INT64 footer
    min/max are exact (never truncated), so the footer-derived stats
    must equal the data-derived stats the oracle computes — a wrong
    bucket route, a lost row, or a misread footer all break the
    hash."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket
    from searchengine_spark.sources.versioned import _scratch_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = _scratch_table("layout_footer")
    (
        li.withColumn(
            "bucket",
            hash_bucket(
                F.col("l_orderkey"), n_buckets=N_LAYOUT_BUCKETS, salt="layout"
            ),
        )
        .repartition(N_LAYOUT_BUCKETS, "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(out)
    )
    import glob as _glob
    import os as _os

    files = sorted(
        _glob.glob(_os.path.join(out, "bucket=*", "*.parquet"))
    )
    man = footer_stats_manifest(spark, files, "l_orderkey")
    return (
        man.withColumn(
            "bucket", F.regexp_extract("path", r"bucket=(\d+)", 1).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.min("key_min").alias("key_min"),
            F.max("key_max").alias("key_max"),
        )
        .orderBy("bucket")
    )


_FOOTER_SQL = f"""
    SELECT ('0x' || substr(md5('layout' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
            % {N_LAYOUT_BUCKETS} AS bucket,
           CAST(1 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS key_min,
           CAST(MAX(l_orderkey) AS BIGINT) AS key_max
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
"""


# ------------------------------------------------ zone-map prune audit

ZONE_FILES = 64
# predicate: one quarter out of the ~6.5y span (~3.8% of rows)
ZONE_PRED_LO = "1998-04-01"
ZONE_PRED_HI = "1998-07-01"
_ZONE_LO_S = 891_388_800  # epoch seconds of ZONE_PRED_LO (UTC)
_ZONE_HI_S = 899_251_200  # epoch seconds of ZONE_PRED_HI (UTC)


def q_zonemap_prune_audit(spark, sf_dir: str) -> DataFrame:
    """How much a time-clustered layout is worth: simulate writing
    orders as ZONE_FILES files under two layouts — `clustered`
    (global o_orderdate order, the write_clustered shape) and
    `hashed` (md5 of o_orderkey, the layout a key-partitioned write
    produces) — build each file's [min,max] o_orderdate zone map, and
    report how many files and rows a one-quarter range predicate must
    scan under min/max pruning.

    This is the planning arithmetic Delta/Iceberg data skipping and
    parquet row-group pruning perform, surfaced as a hash-checked
    query: rows_matched is layout-invariant (same predicate), while
    rows_scanned collapses under the clustered layout (file zones are
    disjoint date slices -> scan ~selectivity*N files) and stays the
    FULL table under the hashed layout (every file's zone spans the
    whole date range -> zero files pruned). scan_amplification =
    rows_scanned / rows_matched is the number a table-layout owner
    watches.

    Scale shape: file assignment for the clustered layout is the
    audited no-partition distributed_rank (two-level bucket prefix
    sum — no single-task global sort); everything after is two keyed
    aggs (per-file zones, per-layout rollup). The audit never writes
    files: zone maps are pure arithmetic on the assignment, which is
    exactly what makes it cheap enough to run BEFORE choosing a
    layout for a 100 TB rewrite."""
    from searchengine_spark.event_time import event_time_seconds
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.distrank import distributed_rank, range_bucket
    from searchengine_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        event_time_seconds(orders, "o_orderdate").alias("date_s"),
    )
    total = base.agg(F.count(F.lit(1)).alias("_tot"))

    ext, bucket = range_bucket(base, "date_s")
    clustered = (
        distributed_rank(
            ext, [], [F.asc("date_s"), F.asc("o_orderkey")], bucket, rank_name="r"
        )
        .crossJoin(F.broadcast(total))
        .select(
            "date_s",
            F.expr(f"((r - 1) * {ZONE_FILES}) div _tot").alias("file_id"),
        )
        .withColumn("layout", F.lit("clustered"))
    )
    hashed = base.select(
        "date_s",
        hash_bucket(F.col("o_orderkey"), n_buckets=ZONE_FILES, salt="zone").alias(
            "file_id"
        ),
    ).withColumn("layout", F.lit("hashed"))

    rows = clustered.unionByName(hashed)
    zones = rows.groupBy("layout", "file_id").agg(
        F.min("date_s").alias("zmin"),
        F.max("date_s").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (
                (F.col("date_s") >= F.lit(_ZONE_LO_S))
                & (F.col("date_s") < F.lit(_ZONE_HI_S))
            ).cast("bigint")
        ).alias("n_match"),
    )
    scanned = (F.col("zmax") >= F.lit(_ZONE_LO_S)) & (
        F.col("zmin") < F.lit(_ZONE_HI_S)
    )
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(scanned.cast("bigint")).alias("files_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0))).alias(
            "rows_scanned"
        ),
        F.sum("n_match").alias("rows_matched"),
        F.round(
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum("n_match").cast("double"),
            6,
        ).alias("scan_amplification"),
    )


_ZONE_SECS = "(epoch_us(o_orderdate) // 1000000)"

_ZONEMAP_SQL = f"""
WITH base AS (
  SELECT o_orderkey, {_ZONE_SECS} AS date_s FROM orders
),
tot AS (SELECT count(*)::BIGINT AS t FROM base),
assigned AS (
  SELECT date_s,
         ((row_number() OVER (ORDER BY date_s, o_orderkey) - 1)
           * {ZONE_FILES}) // (SELECT t FROM tot) AS file_id,
         'clustered' AS layout
  FROM base
  UNION ALL
  SELECT date_s,
         ('0x' || substr(md5('zone' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % {ZONE_FILES} AS file_id,
         'hashed' AS layout
  FROM base
),
zones AS (
  SELECT layout, file_id,
         MIN(date_s) AS zmin, MAX(date_s) AS zmax,
         count(*)::BIGINT AS n_rows,
         SUM(CASE WHEN date_s >= {_ZONE_LO_S} AND date_s < {_ZONE_HI_S}
                  THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM assigned GROUP BY 1, 2
)
SELECT layout,
       count(*)::BIGINT AS n_files,
       SUM(CASE WHEN zmax >= {_ZONE_LO_S} AND zmin < {_ZONE_HI_S}
                THEN 1 ELSE 0 END)::BIGINT AS files_scanned,
       SUM(CASE WHEN zmax >= {_ZONE_LO_S} AND zmin < {_ZONE_HI_S}
                THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned,
       SUM(n_match)::BIGINT AS rows_matched,
       round(CAST(SUM(CASE WHEN zmax >= {_ZONE_LO_S} AND zmin < {_ZONE_HI_S}
                           THEN n_rows ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n_match) AS DOUBLE), 6) AS scan_amplification
FROM zones GROUP BY layout
"""


QUERIES = {
    "layout_zorder_keys": q_layout_zorder_keys,
    "layout_footer_stats": q_layout_footer_stats,
    "layout_zonemap_prune_audit": q_zonemap_prune_audit,
}
ORACLES = {
    "layout_zorder_keys": _ZORDER_SQL,
    "layout_footer_stats": _FOOTER_SQL,
    "layout_zonemap_prune_audit": _ZONEMAP_SQL,
}


def row_groups_touched(path: str, constraints: list[tuple[str, object, object]]) -> tuple[int, int]:
    """(touched, total) row groups whose per-column [min,max] ranges
    intersect EVERY (col, lo, hi) constraint — footer-only, exactly
    the pruning decision a parquet scan's pushed filters make."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    touched = total = 0
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema = md.schema.to_arrow_schema()
        idxs = {c: schema.get_field_index(c) for c, _, _ in constraints}
        for g in range(md.num_row_groups):
            total += 1
            hit = True
            for c, lo, hi in constraints:
                stats = md.row_group(g).column(idxs[c]).statistics
                if stats is None or stats.min is None:
                    continue  # no stats -> can't prune on this column
                if stats.max < lo or stats.min > hi:
                    hit = False
                    break
            if hit:
                touched += 1
    return touched, total
