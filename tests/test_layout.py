"""Z-order layout: 2-dim point-range queries must touch far fewer
row groups than a single-column sort, and results must be identical."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.layout import (
    row_groups_touched,
    with_zorder_rank_key,
    write_clustered,
    write_zordered,
    zorder_key,
)

BLOCK = 48 * 1024  # tiny row groups so toy data yields many of them


@pytest.fixture(scope="module")
def grid(spark):
    # 200x200 uniform grid, shuffled ingestion order
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 200).alias("x"),
            (F.col("id") / 200).cast("bigint").alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .orderBy(F.md5(F.col("id").cast("string")))  # destroy natural order
    )


def test_zorder_key_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int"
    ).select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    zs = [r["z"] for r in rows]
    # morton(1,0)=1, morton(0,1)=2, morton(3,5) = interleave(0b11, 0b101)
    assert zs[0] == 0 and zs[1] == 1 and zs[2] == 2
    assert zs[3] == 0b100111


def test_zorder_prunes_on_every_dimension(grid, tmp_path):
    """The z-order claim is NOT "beats a single-column sort on that
    column's queries" — it can't. It is: ONE layout serves range
    queries on EITHER dimension with real pruning, where a
    single-column sort serves one dimension and reads ~everything
    for the other. Assert the worst-case-dimension behavior."""
    z_dir, x_dir = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(grid, z_dir, "x", "y", n_files=2, block_size_bytes=BLOCK)
    write_clustered(grid, x_dir, ["x"], n_files=2, block_size_bytes=BLOCK)

    x_q, y_q = [("x", 40, 49)], [("y", 40, 49)]  # 5% slabs
    zx, ztot = row_groups_touched(z_dir, x_q)
    zy, _ = row_groups_touched(z_dir, y_q)
    xx, xtot = row_groups_touched(x_dir, x_q)
    xy, _ = row_groups_touched(x_dir, y_q)
    assert ztot >= 8 and xtot >= 8, "need enough row groups to measure"

    # single-column sort: great on its own column, blind on the other
    assert xx / xtot <= 0.2
    assert xy / xtot >= 0.9
    # z-order: real pruning on BOTH dimensions...
    assert zx / ztot <= 0.5 and zy / ztot <= 0.5
    # ...so its worst dimension beats the slab layout's worst by 2x+
    assert max(zx, zy) / ztot < 0.5 * (max(xx, xy) / xtot)

    # the 2-dim box keeps composing (still prunes, never widens)
    zb, _ = row_groups_touched(z_dir, x_q + y_q)
    assert zb <= min(zx, zy)


def test_zorder_layout_preserves_data(grid, spark, tmp_path):
    out = str(tmp_path / "roundtrip")
    write_zordered(grid, out, "x", "y", n_files=2, block_size_bytes=BLOCK)
    back = spark.read.parquet(out)
    assert back.count() == grid.count()
    a = back.filter((F.col("x").between(40, 49)) & (F.col("y").between(40, 49)))
    assert a.count() == 100


def test_rank_key_handles_skew_and_negatives(spark):
    df = spark.createDataFrame(
        [(-(10**9), 1), (0, 2), (1, 3), (2, 10**9), (10**9, -5)], "a long, b long"
    )
    keyed = with_zorder_rank_key(df, "a", "b", bits=2)
    zs = [r["_zkey"] for r in keyed.collect()]
    assert len(zs) == 5 and all(z is not None and z >= 0 for z in zs)


def test_approx_rank_key_close_to_exact(grid, tmp_path):
    """The approxQuantile path (no global sort) must produce a layout
    whose pruning behavior matches the exact path's within noise."""
    from searchengine_spark.operators.layout import with_zorder_rank_key

    exact = with_zorder_rank_key(grid, "x", "y", bits=8)
    approx = with_zorder_rank_key(grid, "x", "y", bits=8, exact=False)
    assert approx.count() == exact.count()
    # pruning check: write both, same 2-dim box, similar touched counts
    d1, d2 = str(tmp_path / "ex"), str(tmp_path / "ap")
    write_zordered(grid, d1, "x", "y", n_files=2, block_size_bytes=BLOCK)
    # direct approx-layout write: same clustering steps as write_zordered
    (
        approx.repartitionByRange(2, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.option("parquet.block.size", BLOCK)
        .mode("overwrite")
        .parquet(d2)
    )
    box = [("x", 40, 49), ("y", 40, 49)]
    t1, n1 = row_groups_touched(d1, box)
    t2, n2 = row_groups_touched(d2, box)
    assert t2 / n2 <= 2.5 * max(t1 / n1, 1 / n1)


def test_zorder_keys_query_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.layout import _ZORDER_SQL, q_layout_zorder_keys
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        q_layout_zorder_keys(spark, sf_dir), _ZORDER_SQL, sf_dir, "layout_zorder_keys"
    )


def test_footer_stats_manifest_matches_oracle(spark, sf_dir):
    """Distributed footer-only manifest build over the bucketed
    layout: footer stats must equal data-derived truth per bucket."""
    from searchengine_spark.operators import layout as L
    from tests.helpers import assert_matches_oracle

    df = L.q_layout_footer_stats(spark, sf_dir)
    rows = df.collect()
    assert [r["bucket"] for r in rows] == list(range(L.N_LAYOUT_BUCKETS))
    assert all(r["n_files"] == 1 for r in rows)
    assert all(r["key_min"] <= r["key_max"] for r in rows)
    assert_matches_oracle(
        df, L.ORACLES["layout_footer_stats"], sf_dir, "layout_footer_stats"
    )


def test_footer_scanner_reads_multiple_row_groups(spark, tmp_path):
    """A file with several row groups must fold min/max across ALL of
    them (regression guard for first-group-only bugs)."""
    from searchengine_spark.operators.layout import footer_stats_manifest

    p = str(tmp_path / "multi.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"k": list(range(1000))})
    pq.write_table(t, p, row_group_size=100)  # 10 row groups
    assert pq.ParquetFile(p).metadata.num_row_groups == 10
    row = footer_stats_manifest(spark, [p], "k").collect()[0]
    assert (row["n_rows"], row["key_min"], row["key_max"]) == (1000, 0, 999)


def test_zonemap_prune_audit_story(spark, sf_dir):
    # the whole point of the audit: clustering must collapse the scan
    from searchengine_spark.operators.layout import (
        ZONE_FILES,
        q_zonemap_prune_audit,
    )

    rows = {r["layout"]: r for r in q_zonemap_prune_audit(spark, sf_dir).collect()}
    assert set(rows) == {"clustered", "hashed"}
    c, h = rows["clustered"], rows["hashed"]
    # predicate truth is layout-invariant
    assert c["rows_matched"] == h["rows_matched"] > 0
    assert c["n_files"] == h["n_files"] == ZONE_FILES
    # hashed zones span the full range: nothing prunes
    assert h["files_scanned"] == ZONE_FILES
    # clustered zones are date slices: scan ~selectivity * N files
    assert c["files_scanned"] < ZONE_FILES // 4
    # a scanned set always covers the matches
    assert c["rows_scanned"] >= c["rows_matched"]
    assert c["scan_amplification"] < h["scan_amplification"]
