"""Versioned table protocol: snapshot isolation, time travel,
incremental reads, conflict detection, vacuum reachability."""

import os

import pytest

from searchengine_spark.sources import versioned as V


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_append_time_travel_and_changes(spark, tmp_path):
    t = os.path.join(tmp_path, "tbl")
    v0 = V.append(spark, spark.range(0, 3).selectExpr("id", "id*10 AS x"), t)
    v1 = V.append(spark, spark.range(3, 5).selectExpr("id", "id*10 AS x"), t)
    v2 = V.append(spark, spark.range(5, 9).selectExpr("id", "id*10 AS x"), t)
    assert (v0, v1, v2) == (0, 1, 2)
    assert V.latest_version(t) == 2

    assert _rows(V.read(spark, t)) == [(i, i * 10) for i in range(9)]
    # time travel: old snapshots unaffected by later commits
    assert _rows(V.read(spark, t, version=0)) == [(i, i * 10) for i in range(3)]
    assert _rows(V.read(spark, t, version=1)) == [(i, i * 10) for i in range(5)]
    # incremental: only the delta
    assert _rows(V.read_changes(spark, t, v_from=0, v_to=2)) == [
        (i, i * 10) for i in range(3, 9)
    ]
    assert V.read_changes(spark, t, v_from=2, v_to=2).count() == 0


def test_overwrite_blocks_incremental_but_time_travels(spark, tmp_path):
    t = os.path.join(tmp_path, "tbl")
    V.append(spark, spark.range(0, 4).selectExpr("id", "id AS x"), t)
    V.overwrite(spark, spark.range(100, 102).selectExpr("id", "id AS x"), t)
    assert _rows(V.read(spark, t)) == [(100, 100), (101, 101)]
    assert _rows(V.read(spark, t, version=0)) == [(i, i) for i in range(4)]
    with pytest.raises(ValueError, match="overwrite"):
        V.read_changes(spark, t, v_from=0, v_to=1)


def test_commit_conflict_detected(spark, tmp_path):
    t = os.path.join(tmp_path, "tbl")
    V.append(spark, spark.range(3).selectExpr("id", "id AS x"), t)
    with pytest.raises(V.CommitConflict):
        V._commit(t, 0, {"version": 0, "kind": "append", "files": [], "added": []})


def test_vacuum_keeps_reachable_only(spark, tmp_path):
    t = os.path.join(tmp_path, "tbl")
    V.append(spark, spark.range(0, 3).selectExpr("id", "id AS x"), t)
    V.overwrite(spark, spark.range(10, 12).selectExpr("id", "id AS x"), t)
    before = _rows(V.read(spark, t))
    deleted = V.vacuum(t, keep_versions=1)
    assert deleted  # v0's files are unreachable from v1
    assert _rows(V.read(spark, t)) == before  # latest snapshot intact
    with pytest.raises(FileNotFoundError):
        V._manifest(t, 0)


def test_streaming_sink_exactly_once_and_versioned(spark, tmp_path):
    from searchengine_spark.io import load_table

    t = os.path.join(tmp_path, "sink_tbl")
    src = os.path.join(tmp_path, "src")
    # two source files -> the file stream delivers them as batches
    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    ev.coalesce(1).write.parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = V.versioned_stream_sink(stream, t)
    q.awaitTermination(120)
    assert V.latest_version(t) >= 1  # one version per micro-batch
    total = V.read(spark, t).count()
    assert total == spark.read.parquet(src).count()

    # at-least-once retry: re-committing an already-durable batch_id
    # must be a no-op — no new version, no duplicate rows.
    last = V.latest_version(t)
    last_bid = V._manifest(t, last)["batch_id"]
    assert V.commit_stream_batch(spark.read.parquet(src).limit(5), last_bid, t) is False
    assert V.latest_version(t) == last
    assert V.read(spark, t).count() == total

    # a genuinely new batch_id commits
    assert V.commit_stream_batch(spark.read.parquet(src).limit(5), 999, t) is True
    assert V.read(spark, t).count() == total + 5


def test_snapshot_diff_change_types(spark, tmp_path):
    t = os.path.join(tmp_path, "diff_tbl")
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, None, 30)], "k long, s string, v long"
    )
    b = spark.createDataFrame(
        [(2, "y", 99), (3, None, 30), (4, "z", 40)], "k long, s string, v long"
    )
    v0 = V.overwrite(spark, a, t)
    v1 = V.overwrite(spark, b, t)
    got = {
        r["k"]: r["change_type"]
        for r in V.snapshot_diff(spark, t, v_from=v0, v_to=v1, key_cols=["k"]).collect()
    }
    # 1 deleted, 2 value-updated, 4 inserted; 3 unchanged (NULL == NULL
    # via null-safe compare) must NOT appear
    assert got == {1: "delete", 2: "update", 4: "insert"}


def test_snapshot_diff_query_matches_oracle(spark, sf_dir):
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        V.q_versioned_diff(spark, sf_dir),
        V.ORACLES["src_versioned_diff"],
        sf_dir,
        "src_versioned_diff",
    )


def test_schema_evolution_and_ts_time_travel(spark, tmp_path):
    import time as _time

    t = os.path.join(tmp_path, "evo_tbl")
    narrow = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    v0 = V.append(spark, narrow, t)
    t_between = _time.time()
    _time.sleep(0.01)
    wide = spark.createDataFrame([(2, "de", 7)], "doc_id long, lang string, n_chars long")
    v1 = V.append(spark, wide, t)

    # latest: merged schema, old row null-filled
    latest = {r["doc_id"]: r for r in V.read(spark, t).collect()}
    assert set(V.read(spark, t).columns) == {"doc_id", "lang", "n_chars"}
    assert latest[1]["n_chars"] is None and latest[2]["n_chars"] == 7

    # version time travel still shows the narrow schema
    assert V.read(spark, t, version=v0).columns == ["doc_id", "lang"]

    # timestamp time travel resolves to the version committed before
    assert V.version_as_of(t, t_between) == v0
    assert V.read(spark, t, as_of_ts=t_between).count() == 1
    assert V.version_as_of(t, _time.time()) == v1
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        V.version_as_of(t, 0.0)


def test_manifest_stats_prune_file_list(spark, tmp_path):
    t = os.path.join(tmp_path, "prune_tbl")
    for lo in (0, 100, 200, 300):
        df = spark.createDataFrame(
            [(lo + i, float(lo + i)) for i in range(10)], "k long, price double"
        ).coalesce(1)
        V.append(spark, df, t, stats_cols=["price"])

    # range inside one slab: exactly one of four files survives
    kept, total = V.pruned_files(t, col="price", lo=105.0, hi=108.0)
    assert total == 4 and len(kept) == 1
    got = V.read_pruned(spark, t, col="price", lo=105.0, hi=108.0).collect()
    assert sorted(r["k"] for r in got) == [105, 106, 107, 108]

    # range spanning two slabs: two files, exact boundary rows kept
    kept2, _ = V.pruned_files(t, col="price", lo=105.0, hi=205.0)
    assert len(kept2) == 2
    n = V.read_pruned(spark, t, col="price", lo=105.0, hi=205.0).count()
    assert n == 5 + 6  # 105..109 from one slab, 200..205 from the other

    # stats-less files are conservatively kept
    V.append(
        spark,
        spark.createDataFrame([(999, 999.0)], "k long, price double").coalesce(1),
        t,
    )
    kept3, total3 = V.pruned_files(t, col="price", lo=105.0, hi=108.0)
    assert total3 == 5 and len(kept3) == 2


def test_streaming_merge_sink_upserts_and_is_idempotent(spark, tmp_path):
    t = os.path.join(tmp_path, "merge_tbl")
    src = os.path.join(tmp_path, "merge_src")
    # batch 1: keys 1,2 ; batch 2: update key 2, insert key 3
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, s string, v double"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(2, "B", 20.0), (3, "c", 3.0)], "k long, s string, v double"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = V.versioned_merge_sink(stream, t, key="k")
    q.awaitTermination(120)

    final = {r["k"]: (r["s"], r["v"]) for r in V.read(spark, t).collect()}
    assert final == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0)}
    # every micro-batch is a time-travelable snapshot
    assert V.latest_version(t) >= 1

    # at-least-once retry: re-merging a durable batch_id is a no-op
    last_bid = V._manifest(t, V.latest_version(t))["batch_id"]
    before = V.latest_version(t)
    assert (
        V.merge_stream_batch(
            spark.createDataFrame([(9, "z", 9.0)], "k long, s string, v double"),
            last_bid,
            t,
            "k",
        )
        is False
    )
    assert V.latest_version(t) == before

    # a new batch merges (update existing + insert new)
    assert V.merge_stream_batch(
        spark.createDataFrame([(1, "A", 10.0), (4, "d", 4.0)], "k long, s string, v double"),
        999,
        t,
        "k",
    ) is True
    final2 = {r["k"]: (r["s"], r["v"]) for r in V.read(spark, t).collect()}
    assert final2[1] == ("A", 10.0) and final2[4] == ("d", 4.0) and len(final2) == 4


def test_mor_reconcile_and_compaction(spark, tmp_path):
    from pyspark.sql import functions as F

    t = os.path.join(tmp_path, "mor_tbl")
    base = spark.createDataFrame(
        [(1, 10.0, False), (2, 20.0, False), (3, 30.0, False)],
        "k long, v double, _tombstone boolean",
    )
    V.append_delta(spark, base, t)
    V.append_delta(  # update 2, insert 4
        spark,
        spark.createDataFrame(
            [(2, 99.0, False), (4, 40.0, False)], "k long, v double, _tombstone boolean"
        ),
        t,
    )
    V.append_delta(  # delete 3
        spark,
        spark.createDataFrame([(3, 0.0, True)], "k long, v double, _tombstone boolean"),
        t,
    )
    want = {1: 10.0, 2: 99.0, 4: 40.0}
    got = {r["k"]: r["v"] for r in V.read_mor(spark, t, key="k").collect()}
    assert got == want

    # WindowGroupLimit: the reconcile prunes per partition pre-shuffle
    plan = V.read_mor(spark, t, key="k")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    # compaction folds the chain; reads are identical after
    V.compact_mor(spark, t, key="k")
    got2 = {r["k"]: r["v"] for r in V.read_mor(spark, t, key="k").collect()}
    assert got2 == want
    # and further deltas keep working on the compacted base
    V.append_delta(
        spark,
        spark.createDataFrame([(1, 11.0, False)], "k long, v double, _tombstone boolean"),
        t,
    )
    assert {r["k"]: r["v"] for r in V.read_mor(spark, t, key="k").collect()} == {
        1: 11.0, 2: 99.0, 4: 40.0
    }


def test_batch_ids_survive_nonstream_commit_and_vacuum(spark, tmp_path):
    """Round-7 ADVICE fix: a non-stream commit (append/overwrite) after
    stream batches must carry the batch_ids chain forward; otherwise
    vacuum() reaps the stream manifests and a foreachBatch retry
    re-commits the batch (duplicate rows)."""
    t = str(tmp_path / "chain")
    df = spark.range(5).withColumnRenamed("id", "v")

    assert V.commit_stream_batch(df, 0, t) is True
    assert V.commit_stream_batch(df, 1, t) is True
    # non-stream commits interleave: append then overwrite
    V.append(spark, df, t)
    V.overwrite(spark, df, t)
    # default retention forgets the stream manifests entirely
    V.vacuum(t, keep_versions=1)
    # retry of a durable batch must STILL be recognized as committed
    assert V.commit_stream_batch(df, 1, t) is False
    assert V.commit_stream_batch(df, 0, t) is False
    # and genuinely new batches still land
    assert V.commit_stream_batch(df, 2, t) is True


def test_committed_batch_ids_fallback_unions_carried_sets(spark, tmp_path):
    """Legacy-manifest fallback: when the LATEST manifest lacks
    batch_ids (pre-upgrade table), the scan must union carried
    batch_ids sets from retained manifests, not just per-manifest
    batch_id stamps."""
    import json
    import os

    t = str(tmp_path / "legacy")
    df = spark.range(3).withColumnRenamed("id", "v")
    assert V.commit_stream_batch(df, 7, t) is True
    assert V.commit_stream_batch(df, 8, t) is True
    V.append(spark, df, t)
    # simulate a pre-upgrade writer: strip batch_ids (and the stamp)
    # from the latest manifest only — older manifests keep theirs
    latest = V.latest_version(t)
    mpath = os.path.join(t, "_log", f"v{latest}.json")
    man = json.load(open(mpath))
    man.pop("batch_ids", None)
    json.dump(man, open(mpath, "w"))
    # v1's manifest still carries batch_ids [7, 8]; the fallback must
    # see BOTH even though v1's own batch_id stamp is only 8
    assert V._committed_batch_ids(t, latest) >= {7, 8}


def test_scratch_tables_reuse_one_root(spark, sf_dir):
    """q_versioned_* scratch dirs must not leak per run: same query
    name reuses one slot under the session root."""
    p1 = V._scratch_table("unit")
    p2 = V._scratch_table("unit")
    assert p1 == p2
    import os

    assert os.path.isdir(p2) and not os.listdir(p2)


def test_time_travel_query_matches_oracle(spark, sf_dir):
    """Driver-checked time travel: the v1 snapshot must survive a
    later destructive overwrite, and ts-travel must agree."""
    from tests.helpers import assert_matches_oracle

    df = V.q_versioned_time_travel(spark, sf_dir)
    # the overwrite kept only ~20% of docs; reading v1 must yield the
    # ~80% slice, not the post-overwrite table (NOTE: don't call
    # _scratch_table here — it would wipe the slot the lazy df reads)
    table = os.path.join(V._SCRATCH_ROOT, "timetravel")
    assert df.count() > V.read(spark, table).count()
    assert_matches_oracle(
        df,
        V.ORACLES["src_versioned_time_travel"],
        sf_dir,
        name="src_versioned_time_travel",
    )
