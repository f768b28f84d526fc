"""Versioned parquet tables: snapshots, time travel, incremental reads.

A minimal lakehouse commit protocol over plain parquet — the three
capabilities a 100 TB corpus pipeline needs from its storage layer
and raw directories don't give:

- **snapshot isolation**: readers pin a version; a concurrent append
  can never tear their file list;
- **time travel**: `read(spark, dir, version=3)` reproduces last
  week's training set byte-for-byte (data lineage for model audits);
- **incremental reads**: `read_changes(v_from, v_to)` returns only
  the files added between versions — the O(delta) input for
  incremental index maintenance (`index/incremental.py`) and the
  rollup IVM (`relational/incremental_agg.py`), instead of O(table)
  rescans.

Protocol (same idea as Delta/Iceberg's log, reduced to its core):
data files are immutable and write-once under `data/`; a commit is a
manifest `_log/v{N}.json` listing ALL data files of that version
plus the commit kind. Manifests are written to a temp name and
`os.rename`d — atomic on POSIX — and a writer must create v{N} with
O_EXCL semantics (rename onto an existing manifest fails the commit,
optimistic concurrency). Readers list `_log/` only: the data
directory is never globbed, so orphaned files from failed writes are
invisible (and a `vacuum` can reap them by set difference).

Scale: the manifest holds file PATHS, not row data — O(files), kept
small by `operators/compaction.py`. Reading a snapshot hands Spark
an explicit file list, which also gives exact-version parallelism.

The reference engine has no storage versioning (scripts re-read one
JSON); this extends the builder's source/sink surface.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _versions(table_dir: str) -> list[int]:
    """Version numbers with a manifest ON DISK, ascending. vacuum()
    deletes manifests older than the retention window, so the log
    need not start at 0 — any loop over table history must walk this
    list, never ``range(0, latest + 1)`` (which raises
    FileNotFoundError on the first vacuumed version)."""
    log = _log_dir(table_dir)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(log)
        if f.startswith("v") and f.endswith(".json")
    )


def latest_version(table_dir: str) -> int:
    """Highest committed version, or -1 for an empty/new table."""
    return max(_versions(table_dir), default=-1)


def _manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_log_dir(table_dir), f"v{version}.json")) as fh:
        return json.load(fh)


def _commit(table_dir: str, version: int, manifest: dict) -> None:
    log = _log_dir(table_dir)
    os.makedirs(log, exist_ok=True)
    final = os.path.join(log, f"v{version}.json")
    tmp = os.path.join(log, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # optimistic concurrency: the version slot must be free. The
    # existence check + rename is not a true CAS on every filesystem,
    # but rename itself is atomic, so readers can never observe a
    # torn manifest — the race window only risks a duplicate-version
    # overwrite between two WRITERS, which the check narrows to ~ns.
    if os.path.exists(final):
        os.remove(tmp)
        raise CommitConflict(f"version {version} already committed")
    os.rename(tmp, final)


_SCRATCH_ROOT: str | None = None


def _scratch_table(name: str) -> str:
    """Fresh scratch table dir for the q_versioned_* protocol proofs,
    under ONE session-scoped root. Replaces per-run tempfile.mkdtemp,
    which leaked a table-sized directory every invocation (bench loops
    re-run these queries many times per process): re-runs of the same
    query wipe and reuse a single named slot, and the whole root is
    removed at interpreter exit."""
    global _SCRATCH_ROOT
    import atexit
    import shutil
    import tempfile

    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_graft_versioned_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    path = os.path.join(_SCRATCH_ROOT, name)
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


def _file_stats(files: list[str], stats_cols: list[str]) -> dict:
    """Per-file [min, max] for each stats column, from parquet
    footers only (no data read) — the write-side half of manifest
    file skipping. Columns without usable footer stats (or non-JSON
    min/max types) are silently omitted: absence of stats must never
    be wrong, only less prunable."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema = md.schema.to_arrow_schema()
        per_col: dict[str, list] = {}
        for c in stats_cols:
            idx = schema.get_field_index(c)
            if idx < 0:
                continue
            lo = hi = None
            ok = True
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or st.min is None or st.max is None:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if ok and isinstance(lo, (int, float, str)) and not isinstance(lo, bool):
                per_col[c] = [lo, hi]
        if per_col:
            out[f] = per_col
    return out


def append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    *,
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as a new version (previous files + new files).
    Returns the committed version number. With ``stats_cols``, the
    manifest records per-file [min, max] for those columns (prior
    files' stats carry forward), enabling `read_pruned` file
    skipping."""
    base = latest_version(table_dir)
    prev = _manifest(table_dir, base) if base >= 0 else {}
    prev_files = prev.get("files", [])

    batch_dir = os.path.join(_data_dir(table_dir), f"batch-{uuid.uuid4().hex}")
    df.write.parquet(batch_dir)
    new_files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )
    stats = dict(prev.get("stats", {}))
    if stats_cols:
        stats.update(_file_stats(new_files, stats_cols))
    version = base + 1
    manifest = {
        "version": version,
        "kind": "append",
        "files": prev_files + new_files,
        "added": new_files,
        "stats": stats,
        "ts": time.time(),
    }
    # Exactly-once chain integrity: carry the stream batch_ids set
    # forward through NON-stream commits too. Without this, an append
    # landing after stream commits leaves the latest manifest without
    # `batch_ids`; once vacuum() reaps the older stream manifests the
    # committed ids are forgotten and a foreachBatch retry re-commits
    # (duplicate rows). The chain must never break.
    if "batch_ids" in prev:
        manifest["batch_ids"] = prev["batch_ids"]
    _commit(table_dir, version, manifest)
    return version


def overwrite(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a full replacement snapshot (old data files
    remain on disk for time travel until vacuumed)."""
    base = latest_version(table_dir)
    prev = _manifest(table_dir, base) if base >= 0 else {}
    batch_dir = os.path.join(_data_dir(table_dir), f"batch-{uuid.uuid4().hex}")
    df.write.parquet(batch_dir)
    new_files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )
    version = base + 1
    manifest = {
        "version": version,
        "kind": "overwrite",
        "files": new_files,
        "added": new_files,
        "ts": time.time(),
    }
    if "batch_ids" in prev:  # see append(): never break the batch_ids chain
        manifest["batch_ids"] = prev["batch_ids"]
    _commit(table_dir, version, manifest)
    return version


def version_as_of(table_dir: str, ts: float) -> int:
    """Largest committed version whose commit time is <= ``ts`` —
    Delta's `TIMESTAMP AS OF`, reduced to a manifest scan over the
    RETAINED log (vacuumed versions are gone and cannot be travelled
    to, matching Delta semantics). Raises if no retained version is
    old enough."""
    best = -1
    for v in _versions(table_dir):
        if _manifest(table_dir, v)["ts"] <= ts:
            best = v
    if best < 0:
        raise FileNotFoundError(f"no version committed at or before {ts}")
    return best


def read(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
    as_of_ts: float | None = None,
) -> DataFrame:
    """Snapshot read at ``version`` (default: latest), or time-travel
    by commit timestamp with ``as_of_ts``. Appends may evolve the
    schema (add columns): snapshots spanning mixed-schema batches
    read with parquet schema merging, old rows null-filled — the
    standard additive-evolution contract."""
    if version is not None and as_of_ts is not None:
        raise ValueError("pass version OR as_of_ts, not both")
    if as_of_ts is not None:
        v = version_as_of(table_dir, as_of_ts)
    else:
        v = latest_version(table_dir) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    files = _manifest(table_dir, v)["files"]
    if not files:
        return spark.createDataFrame([], schema="dummy string").limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*files)


def pruned_files(
    table_dir: str, *, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """(files whose [min,max] for ``col`` intersects [lo, hi], total
    file count) at a snapshot — the manifest-level skipping decision.
    Files without recorded stats are always kept (skipping must be
    conservative)."""
    v = latest_version(table_dir) if version is None else version
    man = _manifest(table_dir, v)
    stats = man.get("stats", {})
    kept = []
    for f in man["files"]:
        s = stats.get(f, {}).get(col)
        if s is not None and (s[1] < lo or s[0] > hi):
            continue
        kept.append(f)
    return kept, len(man["files"])


def read_pruned(
    spark: SparkSession,
    table_dir: str,
    *,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read that opens ONLY the files whose manifest stats
    can satisfy ``col BETWEEN lo AND hi``, then applies the exact
    filter — Iceberg/Delta data skipping reduced to its core. The
    result is identical to filtering the full snapshot (pruning is
    conservative), which is what makes it oracle-checkable; the win
    is that a 100 TB table clustered on the column opens a handful of
    its files. Row-group pruning (operators/layout.py) then continues
    INSIDE each opened file."""
    kept, _total = pruned_files(table_dir, col=col, lo=lo, hi=hi, version=version)
    from pyspark.sql import functions as F

    if not kept:
        return read(spark, table_dir, version=version).filter(F.lit(False))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*kept)
        .filter(F.col(col).between(lo, hi))
    )


def read_changes(
    spark: SparkSession, table_dir: str, *, v_from: int, v_to: int
) -> DataFrame:
    """Rows ADDED in versions (v_from, v_to] — the incremental input.
    Raises if any commit in the range is an overwrite (a rewrite is
    not expressible as appended rows; callers must re-snapshot)."""
    added: list[str] = []
    for v in range(v_from + 1, v_to + 1):
        man = _manifest(table_dir, v)
        if man["kind"] != "append":
            raise ValueError(
                f"version {v} is a {man['kind']}; incremental read "
                "only spans append commits"
            )
        added.extend(man["added"])
    if not added:
        return read(spark, table_dir, version=v_to).limit(0)
    # mergeSchema matches the snapshot read's additive-evolution
    # contract: an incremental range spanning a schema-evolution
    # append must surface the new column (null-filled for older
    # files), not silently drop it to whichever footer wins inference.
    return spark.read.option("mergeSchema", "true").parquet(*added)


def append_delta(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Merge-on-read write: commit ``df`` as a DELTA — rows stamped
    with their commit version (`_cv`), appended without touching
    existing data. Updates and inserts are just rows for the key;
    deletes are rows with a true `_tombstone` column. Writes stay
    O(batch) however big the table is — the reconciliation cost moves
    to `read_mor`, which is the whole CoW/MoR trade."""
    from pyspark.sql import functions as F

    version = latest_version(table_dir) + 1
    return append(spark, df.withColumn("_cv", F.lit(version)), table_dir)


def read_mor(
    spark: SparkSession,
    table_dir: str,
    *,
    key: str,
    version: int | None = None,
) -> DataFrame:
    """Merge-on-read reconciliation: latest `_cv` row per key wins;
    tombstoned keys drop. One key-partitioned window over the union
    of base + deltas — at 100 TB this is the read tax MoR pays until
    `compact_mor` folds the deltas down (and Catalyst turns the
    row_number filter into WindowGroupLimit, pruning per partition
    before the exchange)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = read(spark, table_dir, version=version)
    w = Window.partitionBy(key).orderBy(F.desc("_cv"))
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_cv")
    )
    if "_tombstone" in out.columns:
        out = out.filter(
            ~F.coalesce(F.col("_tombstone"), F.lit(False))
        ).drop("_tombstone")
    return out


def compact_mor(spark: SparkSession, table_dir: str, *, key: str) -> int:
    """Fold the delta chain: commit the reconciled state as a fresh
    base (an overwrite stamped as delta 0 of the next era). Run it
    when the read-side window starts to hurt — the same job Iceberg
    calls rewrite_data_files and Delta calls OPTIMIZE."""
    from pyspark.sql import functions as F

    state = read_mor(spark, table_dir, key=key)
    version = latest_version(table_dir) + 1
    return overwrite(spark, state.withColumn("_cv", F.lit(version)), table_dir)


def vacuum_plan(
    table_dir: str, *, keep_versions: int = 1
) -> tuple[list[str], list[int]]:
    """Dry-run half of vacuum(): (reclaimable data files, manifest
    versions that would be dropped), touching nothing. The file list
    is the set difference data-dir \\ union(retained manifests) —
    exactly what vacuum() deletes."""
    latest = latest_version(table_dir)
    keep = range(max(0, latest - keep_versions + 1), latest + 1)
    live: set[str] = set()
    for v in keep:
        live.update(_manifest(table_dir, v)["files"])
    plan = []
    data = _data_dir(table_dir)
    for root, _dirs, files in os.walk(data):
        for f in sorted(files):
            p = os.path.join(root, f)
            if f.endswith(".parquet") and p not in live:
                plan.append(p)
    drop = [
        v
        for v in range(0, keep.start)
        if os.path.exists(os.path.join(_log_dir(table_dir), f"v{v}.json"))
    ]
    return plan, drop


def vacuum(table_dir: str, *, keep_versions: int = 1) -> list[str]:
    """Delete data files unreachable from the newest ``keep_versions``
    manifests (and drop older manifests). Returns deleted paths."""
    plan, drop = vacuum_plan(table_dir, keep_versions=keep_versions)
    for p in plan:
        os.remove(p)
    for v in drop:
        os.remove(os.path.join(_log_dir(table_dir), f"v{v}.json"))
    return plan


# --------------------------------------------------------------- queries

def q_versioned_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end protocol proof as a driver-checked query: commit
    documents as two hash-split append versions into a scratch
    versioned table, then read ONLY the delta of the second commit.
    The oracle restates the split predicate — if snapshotting,
    manifest isolation, or the incremental file list were wrong, the
    row set could not match."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    first = docs.filter(hash_bucket(F.col("doc_id"), salt="ver") < 5000)
    second = docs.filter(hash_bucket(F.col("doc_id"), salt="ver") >= 5000)

    table = _scratch_table("incremental")
    v0 = append(spark, first, table)
    v1 = append(spark, second, table)
    return read_changes(spark, table, v_from=v0, v_to=v1)


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    *,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots — the "what changed
    between Monday and Friday" audit a change-data-feed answers when
    per-commit deltas weren't recorded (Delta calls this CDF
    backfill). One full-outer join keyed on ``key_cols``:

      insert — key only in ``v_to``
      delete — key only in ``v_from``
      update — key in both, any non-key column IS DISTINCT FROM

    Unchanged rows are dropped, so the output is |changes|, not
    |table|. At 100 TB this is one shuffle per side on the key (or
    zero Exchange when both snapshots are bucketed on it); null-safe
    comparison keeps NULL→NULL out of the update set in both engines.
    """
    from pyspark.sql import functions as F

    old = read(spark, table_dir, version=v_from).withColumn("_in_old", F.lit(1))
    new = read(spark, table_dir, version=v_to).withColumn("_in_new", F.lit(1))
    val_cols = [c for c in old.columns if c not in key_cols and c != "_in_old"]
    joined = old.join(
        new, [old[k].eqNullSafe(new[k]) for k in key_cols], "full_outer"
    )
    # presence markers, not key-null tests: NULL keys stay diffable
    in_old = old["_in_old"].isNotNull()
    in_new = new["_in_new"].isNotNull()
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~old[c].eqNullSafe(new[c])
    return (
        joined.withColumn(
            "change_type",
            F.when(~in_old, F.lit("insert"))
            .when(~in_new, F.lit("delete"))
            .when(changed, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.coalesce(new[k], old[k]).alias(k) for k in key_cols],
            F.col("change_type"),
            *[old[c].alias(f"old_{c}") for c in val_cols],
            *[new[c].alias(f"new_{c}") for c in val_cols],
        )
    )


def q_versioned_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked snapshot diff: two OVERWRITE commits built from
    hash-bucket predicates over documents (buckets [0,6000) then
    [1000,10000), with the value column bumped on [2000,4000) so all
    three change types appear), diffed via the full-outer protocol.
    The oracle restates both snapshot predicates and the diff in SQL —
    a wrong manifest, a non-null-safe compare, or a leaked unchanged
    row all break the hash."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), salt="diff")
    base = docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        bucket.alias("_b"),
    )
    snap_a = base.filter(F.col("_b") < 6000).drop("_b")
    snap_b = (
        base.filter(F.col("_b") >= 1000)
        .select(
            "doc_id",
            "lang",
            (
                F.col("n_chars")
                + F.when((F.col("_b") >= 2000) & (F.col("_b") < 4000), 1).otherwise(0)
            ).alias("n_chars"),
        )
    )

    table = _scratch_table("diff")
    v0 = overwrite(spark, snap_a, table)
    v1 = overwrite(spark, snap_b, table)
    return snapshot_diff(
        spark, table, v_from=v0, v_to=v1, key_cols=["doc_id"]
    ).orderBy("doc_id")


def q_versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution through the commit log: v0 appends
    documents WITHOUT n_chars, v1 appends the rest WITH it; the
    latest snapshot must read as the merged schema with old rows
    null-filled (and time-travel to v0 must still show the narrow
    schema — pinned in tests). The oracle restates the split as a
    UNION with a NULL column."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), salt="evo")
    first = docs.filter(bucket < 5000).select("doc_id", "lang")
    second = docs.filter(bucket >= 5000).select("doc_id", "lang", "n_chars")

    table = _scratch_table("evo")
    append(spark, first, table)
    append(spark, second, table)
    return read(spark, table).orderBy("doc_id")


PRUNE_LO, PRUNE_HI = 200000.0, 250000.0

# Vacuum-audit commit layout: overwrite [0, VAC_CUT_APPEND) -> append
# [VAC_CUT_APPEND, VAC_CUT_KEEP) -> destructive overwrite
# [VAC_CUT_KEEP, N_BUCKETS). Shared by q_versioned_vacuum_audit and
# its oracle (round-10 ADVICE: the oracle used to hardcode the cuts
# and hash_bucket's modulus, so changing either side drifted silently
# until a driver hash-fail).
VAC_CUT_APPEND = 5000
VAC_CUT_KEEP = 8000


def q_versioned_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest file skipping end-to-end: orders committed as four
    range-clustered appends (price quartile slabs, one commit each)
    with o_totalprice stats recorded; a BETWEEN read must touch only
    the slab(s) that can contain the range — tests/test_versioned.py
    asserts the file-count drop — and hash-match the plain filtered
    aggregate the oracle states."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = _scratch_table("prune")
    bounds = [0.0, 100000.0, 200000.0, 300000.0, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        slab = orders.filter(
            (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
        ).coalesce(1)
        append(spark, slab, table, stats_cols=["o_totalprice"])
    return (
        read_pruned(spark, table, col="o_totalprice", lo=PRUNE_LO, hi=PRUNE_HI)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


def q_versioned_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read end-to-end: base (buckets [0,7000)), an update
    delta (+1 n_chars on [0,2000) plus inserts [7000,10000)), and a
    tombstone delta deleting [2000,3000) — reconciled by the keyed
    window. The oracle restates the three layers as a UNION with
    ROW_NUMBER; a wrong version stamp, tombstone leak, or
    lost-update all break the hash."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), salt="mor")
    base = docs.filter(b < 7000).select(
        "doc_id", "lang", "n_chars", F.lit(False).alias("_tombstone")
    )
    upd = (
        docs.filter(b < 2000)
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") + 1).alias("n_chars"),
            F.lit(False).alias("_tombstone"),
        )
        .unionByName(
            docs.filter(b >= 7000).select(
                "doc_id", "lang", "n_chars", F.lit(False).alias("_tombstone")
            )
        )
    )
    dels = docs.filter((b >= 2000) & (b < 3000)).select(
        "doc_id", "lang", "n_chars", F.lit(True).alias("_tombstone")
    )

    table = _scratch_table("mor")
    for layer in (base, upd, dels):
        append_delta(spark, layer, table)
    return read_mor(spark, table, key="doc_id").orderBy("doc_id")


def q_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a driver-checked query: two appends build the
    v1 snapshot (buckets [0,4000) then [4000,8000)), then a
    DESTRUCTIVE overwrite replaces the table with only [8000,10000).
    The query reads `version=1` — and cross-checks that timestamp
    travel (`as_of_ts` at v1's commit time) resolves to the same
    snapshot. If snapshot isolation leaked the overwrite (or version
    resolution were off by one), rows from the wrong snapshot appear
    and the hash breaks; the oracle restates v1's predicate
    (bucket < 8000) directly against the base table."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), salt="tt")
    table = _scratch_table("timetravel")
    append(spark, docs.filter(b < 4000).select("doc_id", "lang"), table)
    v1 = append(
        spark, docs.filter((b >= 4000) & (b < 8000)).select("doc_id", "lang"), table
    )
    overwrite(spark, docs.filter(b >= 8000).select("doc_id", "lang"), table)

    t1 = _manifest(table, v1)["ts"]
    if version_as_of(table, t1) != v1:  # ts-travel must agree with version-travel
        raise AssertionError("as_of_ts resolution diverged from version travel")
    return read(spark, table, version=v1).orderBy("doc_id")




def q_versioned_vacuum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM dry-run as a driver-checked query: three commits
    (overwrite buckets [0,5000) -> append [5000,8000) -> DESTRUCTIVE
    overwrite [8000,10000)), then the retention plan for
    keep_versions=1. Every v0/v1 data file is unreachable from the
    v2 manifest, so the reclaimable row mass must equal EXACTLY the
    [0,8000) bucket population and the kept snapshot the rest — the
    oracle restates both as hash predicates. If manifest reachability
    (the set difference vacuum() deletes by) over- or under-counted a
    single file, a row-count side would shift and the hash would
    fail. The plan itself is O(files) driver work (path strings, no
    data); the row counts are two lazy aggregates over the planned
    file lists."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    b = hash_bucket(F.col("doc_id"), salt="vac")

    table = _scratch_table("vacuum_audit")
    overwrite(spark, docs.filter(b < VAC_CUT_APPEND), table)
    append(
        spark, docs.filter((b >= VAC_CUT_APPEND) & (b < VAC_CUT_KEEP)), table
    )
    overwrite(spark, docs.filter(b >= VAC_CUT_KEEP), table)

    plan, drop = vacuum_plan(table, keep_versions=1)
    kept = read(spark, table).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_kept")
    )
    if plan:
        reclaim = (
            spark.read.schema("doc_id long, lang string")
            .parquet(*plan)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows_reclaimable"))
        )
    else:
        reclaim = spark.range(1).select(
            F.lit(0).cast("bigint").alias("n_rows_reclaimable")
        )
    return (
        kept.crossJoin(reclaim)
        .withColumn(
            "n_manifests_dropped", F.lit(len(drop)).cast("bigint")
        )
    )


QUERIES = {
    "src_versioned_vacuum_audit": q_versioned_vacuum_audit,
    "src_versioned_incremental": q_versioned_incremental,
    "src_versioned_time_travel": q_versioned_time_travel,
    "src_versioned_diff": q_versioned_diff,
    "src_versioned_schema_evolution": q_versioned_schema_evolution,
    "src_versioned_pruned_read": q_versioned_pruned_read,
    "src_versioned_mor_read": q_versioned_mor_read,
}

from searchengine_spark.operators.sampling import N_BUCKETS as _N_BUCKETS  # noqa: E402

ORACLES = {
    "src_versioned_vacuum_audit": f"""
        WITH b AS (
          SELECT ('0x' || substr(md5('vac' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % {_N_BUCKETS} AS bk
          FROM documents
        )
        SELECT CAST(SUM(CASE WHEN bk >= {VAC_CUT_KEEP} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rows_kept,
               CAST(SUM(CASE WHEN bk < {VAC_CUT_KEEP} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rows_reclaimable,
               CAST(2 AS BIGINT) AS n_manifests_dropped
        FROM b
    """,
    "src_versioned_time_travel": """
        SELECT doc_id, lang FROM documents
        WHERE (('0x' || substr(md5('tt' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000) < 8000
        ORDER BY doc_id
    """,
    "src_versioned_incremental": """
        SELECT doc_id, lang FROM documents
        WHERE (('0x' || substr(md5('ver' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000) >= 5000
    """,
    "src_versioned_mor_read": """
        WITH b AS (
          SELECT doc_id, lang, n_chars,
                 ('0x' || substr(md5('mor' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 10000 AS bk
          FROM documents
        ), layers AS (
          SELECT doc_id, lang, n_chars, FALSE AS tomb, 0 AS cv FROM b WHERE bk < 7000
          UNION ALL
          SELECT doc_id, lang, n_chars + 1, FALSE, 1 FROM b WHERE bk < 2000
          UNION ALL
          SELECT doc_id, lang, n_chars, FALSE, 1 FROM b WHERE bk >= 7000
          UNION ALL
          SELECT doc_id, lang, n_chars, TRUE, 2 FROM b WHERE bk >= 2000 AND bk < 3000
        ), r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cv DESC) AS rn
          FROM layers
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM r WHERE rn = 1 AND NOT tomb
        ORDER BY doc_id
    """,
    "src_versioned_pruned_read": f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_totalprice BETWEEN {PRUNE_LO} AND {PRUNE_HI}
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "src_versioned_schema_evolution": """
        SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
        FROM documents
        WHERE ('0x' || substr(md5('evo' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 10000 < 5000
        UNION ALL
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE ('0x' || substr(md5('evo' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 10000 >= 5000
        ORDER BY doc_id
    """,
    "src_versioned_diff": """
        WITH base AS (
          SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
                 ('0x' || substr(md5('diff' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 10000 AS b
          FROM documents
        ), a AS (
          SELECT doc_id, lang, n_chars FROM base WHERE b < 6000
        ), bb AS (
          SELECT doc_id, lang,
                 n_chars + CASE WHEN b >= 2000 AND b < 4000 THEN 1 ELSE 0 END AS n_chars
          FROM base WHERE b >= 1000
        )
        SELECT COALESCE(bb.doc_id, a.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'insert'
                    WHEN bb.doc_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               a.lang AS old_lang, a.n_chars AS old_n_chars,
               bb.lang AS new_lang, bb.n_chars AS new_n_chars
        FROM a FULL OUTER JOIN bb ON a.doc_id = bb.doc_id
        WHERE a.doc_id IS NULL OR bb.doc_id IS NULL
           OR (a.lang IS DISTINCT FROM bb.lang)
           OR (a.n_chars IS DISTINCT FROM bb.n_chars)
        ORDER BY doc_id
    """,
}


# ------------------------------------------------------- streaming sink

def _committed_batch_ids(table_dir: str, latest: int) -> set:
    """All stream batch_ids ever committed to this table.

    The latest manifest carries the full set forward
    (``batch_ids``), so the idempotency check is ONE manifest read —
    O(1) per micro-batch instead of O(versions) (a long-lived sink
    was paying O(V^2) cumulative manifest reads), and it survives
    vacuum() deleting old manifests (which previously crashed the
    next micro-batch outright). Non-stream commits (append/overwrite,
    and therefore append_delta/compact_mor) carry the set forward too,
    so the chain survives interleaved batch writes + vacuum. Tables
    written before batch_ids existed fall back to scanning the
    RETAINED manifests once — collecting BOTH per-manifest batch_id
    stamps and any carried batch_ids sets — and the next commit
    upgrades them to the carried-forward form."""
    if latest < 0:
        return set()
    man = _manifest(table_dir, latest)
    if "batch_ids" in man:
        return set(man["batch_ids"])
    ids: set = set()
    for v in _versions(table_dir):
        old = _manifest(table_dir, v)
        bid = old.get("batch_id")
        if bid is not None:
            ids.add(bid)
        ids.update(old.get("batch_ids", []))
    return ids


def commit_stream_batch(batch_df, batch_id: int, table_dir: str) -> bool:
    """Idempotent micro-batch commit: append ``batch_df`` as a new
    version stamped with the source ``batch_id``; a batch_id already
    present in the log is skipped WITHOUT writing (returns False).
    This is what turns at-least-once foreachBatch delivery into an
    exactly-once sink."""
    latest = latest_version(table_dir)
    committed = _committed_batch_ids(table_dir, latest)
    if batch_id in committed:
        return False  # retry of a durable batch
    prev = _manifest(table_dir, latest)["files"] if latest >= 0 else []
    batch_dir = os.path.join(_data_dir(table_dir), f"batch-{uuid.uuid4().hex}")
    batch_df.write.parquet(batch_dir)
    files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )
    _commit(
        table_dir,
        latest + 1,
        {
            "version": latest + 1,
            "kind": "append",
            "files": prev + files,
            "added": files,
            "batch_id": batch_id,
            "batch_ids": sorted(committed | {batch_id}),
            "ts": time.time(),
        },
    )
    return True


def versioned_stream_sink(stream_df, table_dir: str):
    """Exactly-once streaming sink backed by the versioned log.

    foreachBatch is at-least-once: on recovery Structured Streaming
    re-delivers the last batch under the SAME batch_id; the manifest
    carries that id, so a retry is detected BEFORE any commit
    (commit_stream_batch) — no read-side dedup needed. Every
    micro-batch lands as a snapshot version: downstream consumers
    time-travel or read O(delta) changes instead of rescanning.

    Returns the StreamingQuery; caller awaits termination.
    """
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: commit_stream_batch(df, bid, table_dir)
        )
        .trigger(availableNow=True)
        .start()
    )


def merge_stream_batch(
    batch_df, batch_id: int, table_dir: str, key: str
) -> bool:
    """Idempotent micro-batch MERGE: upsert the batch into the
    latest snapshot by key and commit the merged state as an
    OVERWRITE version stamped with ``batch_id`` (retries of a
    durable batch are detected before any write, exactly like the
    append sink). Duplicate keys WITHIN a batch would fan the merge
    out (documented merge_upsert behavior), so the batch is deduped
    to one row per key first; picking a SPECIFIC survivor (e.g.
    latest event) is the caller's upstream ordering job."""
    committed = _committed_batch_ids(table_dir, latest_version(table_dir))
    if batch_id in committed:
        return False
    from searchengine_spark.operators.upsert import merge_upsert

    batch_df = batch_df.dropDuplicates([key])
    if latest_version(table_dir) < 0:
        merged = batch_df
    else:
        spark = batch_df.sparkSession
        target = read(spark, table_dir)
        merged = merge_upsert(target, batch_df, key).drop("_merge_action")

    base = latest_version(table_dir)
    batch_dir = os.path.join(_data_dir(table_dir), f"batch-{uuid.uuid4().hex}")
    merged.write.parquet(batch_dir)
    files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )
    _commit(
        table_dir,
        base + 1,
        {
            "version": base + 1,
            "kind": "overwrite",
            "files": files,
            "added": files,
            "batch_id": batch_id,
            "batch_ids": sorted(committed | {batch_id}),
            "ts": time.time(),
        },
    )
    return True


def versioned_merge_sink(stream_df, table_dir: str, *, key: str):
    """Exactly-once streaming MERGE sink: every micro-batch upserts
    into the table state by key; each version is the full
    post-merge snapshot (copy-on-write, Delta's streaming MERGE
    shape). Idempotent under foreachBatch's at-least-once redelivery
    via the manifest batch_id.

    Scale note: copy-on-write rewrites the table per batch — right
    for dimension-sized tables (the usual MERGE target); a 100 TB
    fact table wants merge-on-read (append the delta, reconcile at
    read with a keyed window), which is exactly `read_changes` +
    `snapshot_diff` territory.
    """
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: merge_stream_batch(df, bid, table_dir, key)
        )
        .trigger(availableNow=True)
        .start()
    )
