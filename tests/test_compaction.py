"""Compaction: packing math, content preservation, big-file skip."""

import os

from searchengine_spark.operators.compaction import (
    compact_table,
    list_data_files,
    plan_bins,
)


def test_plan_bins_ffd_properties():
    files = [(f"f{i}", s) for i, s in enumerate([90, 60, 50, 40, 30, 10, 200])]
    rewrite, keep = plan_bins(files, target_bytes=100)
    assert "f6" in keep  # >= target: never rewritten
    flat = [p for b in rewrite for p in b]
    assert sorted(flat + [p for p in keep]) == sorted(p for p, _ in files)
    for b in rewrite:
        assert len(b) > 1
        assert sum(s for p, s in files if p in b) <= 100
    # FFD on [90,60,50,40,30,10] at cap 100: [90,10],[60,40],[50,30]
    assert len(rewrite) == 3


def test_compact_preserves_content_and_shrinks_file_count(spark, tmp_path):
    src = os.path.join(tmp_path, "frag")
    out = os.path.join(tmp_path, "compact")
    # 30 single-row appends -> 30 tiny files (the streaming-sink wound)
    df = spark.range(30).selectExpr("id", "id * 2 AS v")
    df.repartition(30).write.mode("overwrite").parquet(src)
    n_before = len(list_data_files(src))
    assert n_before >= 20  # hash-repartition may leave a few empties

    stats = compact_table(spark, src, out, target_bytes=1 << 20)
    assert stats["rows"] == 30
    assert stats["files_after"] < n_before / 3
    assert stats["files_before"] == n_before
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b


def test_compact_leaves_healthy_files_alone(spark, tmp_path):
    src = os.path.join(tmp_path, "mixed")
    out = os.path.join(tmp_path, "mixed_out")
    spark.range(1000).write.mode("overwrite").parquet(src)
    healthy = [s for _, s in list_data_files(src)]
    # tiny target: every existing file counts as "big enough"
    stats = compact_table(spark, src, out, target_bytes=10)
    assert stats["bins_rewritten"] == 0
    assert stats["files_untouched"] == len(healthy)
    assert sorted(s for _, s in list_data_files(out)) == sorted(healthy)


def test_compact_nested_layout_and_basename_collision(spark, tmp_path):
    """Round-7 ADVICE fix: (a) input rows counted from the DISCOVERED
    file list so nested batch-dir layouts compact correctly; (b) kept
    files with identical basenames in different subdirs must not
    collide (the old code's second link fell back to copy2, silently
    overwriting the first — data loss)."""
    import glob
    import os
    import shutil

    t = tmp_path / "table"
    spark.range(50).coalesce(1).write.parquet(str(t / "batch-a"))
    src = glob.glob(str(t / "batch-a" / "*.parquet"))[0]
    os.makedirs(t / "batch-b")
    shutil.copy(src, t / "batch-b" / os.path.basename(src))  # same basename

    out = tmp_path / "out"
    # target 1 byte -> every file >= target -> all kept (the collision path)
    stats = compact_table(spark, str(t), str(out), target_bytes=1)
    assert stats["rows"] == 100
    assert spark.read.parquet(str(out)).count() == 100
