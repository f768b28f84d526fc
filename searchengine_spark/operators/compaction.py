"""Small-file compaction: bin-pack parquet fragments to target size.

The small-file problem is the canonical operational failure of a
long-lived 100 TB lake: streaming sinks, incremental appends
(index/incremental.py), and per-batch IVM writes each leave
kilobyte-scale parquet files; a million of them turns every scan's
planning phase into a metadata crawl and every task into an open/
close storm. Compaction rewrites fragments into ~target-size files
WITHOUT a full-table shuffle:

  1. list file sizes (driver-side metadata only);
  2. first-fit-decreasing bin packing into bins <= target bytes —
     FFD uses at most (11/9)OPT+1 bins, and crucially never merges
     already-large files (a file >= target rides alone untouched...
     skipped entirely: rewriting it buys nothing);
  3. one coalesce(1) read->write per bin, reading ONLY that bin's
     files. Bins are independent — a cluster scheduler runs them as
     concurrent jobs; there is no shuffle anywhere because the merge
     is pure concatenation (parquet row groups append; no ordering
     contract is claimed or kept).

Contrast with the naive `read.repartition(n).write`: that shuffles
every byte of the table to fix a metadata problem.

`layout.py` owns WHERE rows go (z-order clustering); this owns HOW
BIG the files are. Run compaction after enough appends, re-z-order
only when skip-rate decays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def list_data_files(table_dir: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file, deterministic order."""
    out = []
    for root, _dirs, files in os.walk(table_dir):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def plan_bins(
    files: list[tuple[str, int]], target_bytes: int
) -> tuple[list[list[str]], list[str]]:
    """First-fit-decreasing pack -> (bins_to_rewrite, leave_alone).

    Files >= target are left alone (rewriting them is pure cost), as
    is any bin that ends up holding a single file."""
    big = [p for p, s in files if s >= target_bytes]
    small = sorted(
        ((p, s) for p, s in files if s < target_bytes),
        key=lambda ps: (-ps[1], ps[0]),
    )
    bins: list[list] = []  # [paths, packed_bytes]
    for p, s in small:
        for b in bins:
            if b[1] + s <= target_bytes:
                b[0].append(p)
                b[1] += s
                break
        else:
            bins.append([[p], s])
    rewrite = [b[0] for b in bins if len(b[0]) > 1]
    single = [b[0][0] for b in bins if len(b[0]) == 1]
    return rewrite, big + single


def compact_table(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    *,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Compact ``table_dir`` into ``out_dir``; returns before/after
    stats. Untouched files are hard-linked (fall back to copy) —
    zero data movement for the already-healthy fraction.

    Verifies row-count equality before reporting success: a
    compaction that loses rows must raise, not return."""
    import shutil

    files = list_data_files(table_dir)
    rewrite, keep = plan_bins(files, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    # Count from the DISCOVERED file list, not the directory: nested
    # layouts (versioned data/batch-*/ subdirs) are invisible to a
    # non-recursive spark.read.parquet(table_dir), which would
    # undercount the input and fail the equality check spuriously.
    n_in = (
        spark.read.parquet(*[p for p, _ in files]).count() if files else 0
    )
    for bin_files in rewrite:
        (
            spark.read.parquet(*bin_files)
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )
    # Collision-proof kept names: two subdirs both holding a
    # part-00000-*.parquet must not fight over one destination (the
    # second link fails -> copy2 silently OVERWRITES -> data loss).
    for i, p in enumerate(keep):
        dst = os.path.join(out_dir, f"keep-{i:05d}-{os.path.basename(p)}")
        try:
            os.link(p, dst)
        except OSError:
            shutil.copy2(p, dst)

    n_out = spark.read.parquet(out_dir).count()
    if n_in != n_out:
        raise RuntimeError(
            f"compaction row-count mismatch: {n_in} in, {n_out} out"
        )
    out_files = list_data_files(out_dir)
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bins_rewritten": len(rewrite),
        "files_untouched": len(keep),
        "bytes_before": sum(s for _, s in files),
        "bytes_after": sum(s for _, s in out_files),
        "rows": n_in,
    }
