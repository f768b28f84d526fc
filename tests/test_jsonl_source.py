"""Custom JSONL DataSource: partition-per-file reads, corrupt-line
quarantine, planner filter pushdown, exactly-once sink, stream tail."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from searchengine_spark.sources.jsonl import (
    JsonlReader,
    _compile_filters,
    register_jsonl_source,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [
        {"doc_id": 1, "text": "spark join", "lang": "en", "source": "web"},
        {"doc_id": 2, "text": "merge sort", "lang": "en", "source": "book"},
        {"doc_id": 3, "text": "flink stream", "lang": "de", "source": "web"},
    ]
    with open(d / "a.jsonl", "w") as fh:
        for r in rows[:2]:
            fh.write(json.dumps(r) + "\n")
    with open(d / "b.jsonl", "w") as fh:
        fh.write(json.dumps(rows[2]) + "\n")
        fh.write("{not valid json\n")  # quarantined, not fatal
        fh.write("[1,2,3]\n")  # valid JSON, not an object -> quarantined
    return str(d)


@pytest.fixture(scope="module")
def registered(spark):
    register_jsonl_source(spark)
    return spark


def test_read_with_quarantine(registered, corpus_dir):
    df = registered.read.format("jsonl_docs").load(corpus_dir)
    good = df.filter(F.col("_corrupt").isNull())
    assert good.count() == 3
    bad = df.filter(F.col("_corrupt").isNotNull()).collect()
    assert sorted(r["_corrupt"] for r in bad) == ["[1,2,3]", "{not valid json"]
    assert all(r["doc_id"] is None for r in bad)


def test_partition_per_file(registered, corpus_dir):
    df = registered.read.format("jsonl_docs").load(corpus_dir)
    assert df.rdd.getNumPartitions() == 2


def test_filter_pushdown_splits_supported_from_residual(registered):
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("doc_id bigint, lang string, _corrupt string")
    r = JsonlReader(schema, {"path": "/nonexistent-ok"})
    filters = [
        EqualTo(("lang",), "en"),
        GreaterThan(("doc_id",), 1),  # unsupported -> stays with Spark
        IsNotNull(("doc_id",)),
        EqualTo(("a", "b"), 1),  # nested -> unsupported
    ]
    residual = list(r.pushFilters(filters))
    assert [type(f).__name__ for f in r.pushed] == ["EqualTo", "IsNotNull"]
    assert [type(f).__name__ for f in residual] == ["GreaterThan", "EqualTo"]


def test_pushed_filters_prune_rows_and_results_stay_correct(registered, corpus_dir):
    df = (
        registered.read.format("jsonl_docs")
        .load(corpus_dir)
        .filter((F.col("lang") == "en") & (F.col("doc_id") > 1))
    )
    rows = df.collect()
    assert [r["doc_id"] for r in rows] == [2]
    # the EqualTo was absorbed into the scan (no lang residual in the
    # plan); the unsupported GreaterThan stayed as a Filter node above
    plan = df._jdf.queryExecution().executedPlan().toString()
    filter_lines = [ln for ln in plan.splitlines() if "Filter (" in ln]
    assert filter_lines and all("doc_id" in ln for ln in filter_lines)
    assert all("lang" not in ln for ln in filter_lines)


def test_pushed_filters_do_not_leak_quarantine_rows(registered, corpus_dir):
    """pushFilters claims EqualTo as fully handled, so the scan must
    not emit corrupt-quarantine rows (data fields NULL) that violate
    the pushed predicate — there is no residual Spark filter left to
    drop them."""
    df = registered.read.format("jsonl_docs").load(corpus_dir).filter(
        F.col("lang") == "en"
    )
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    assert all(r["_corrupt"] is None for r in rows)
    # and quarantine rows remain reachable when asked for explicitly
    bad = (
        registered.read.format("jsonl_docs")
        .load(corpus_dir)
        .filter(F.col("_corrupt").isNotNull())
    )
    assert bad.count() == 2


def test_in_and_startswith_pushdown_semantics():
    from pyspark.sql.datasource import In, StringStartsWith

    supported, pred = _compile_filters(
        [In(("lang",), ("en", "fr")), StringStartsWith(("text",), "sp")]
    )
    assert len(supported) == 2
    assert pred({"lang": "en", "text": "spark"})
    assert not pred({"lang": "de", "text": "spark"})
    assert not pred({"lang": "en", "text": "flink"})
    assert not pred({"lang": "en", "text": None})


def test_writer_roundtrip_and_overwrite(registered, tmp_path):
    out = str(tmp_path / "out")
    df = registered.createDataFrame(
        [(10, "alpha", "en", "web"), (11, "beta", "de", "book")],
        "doc_id long, text string, lang string, source string",
    )
    df.write.format("jsonl_docs").mode("append").save(out)
    back = (
        registered.read.format("jsonl_docs")
        .schema("doc_id long, text string, lang string, source string, _corrupt string")
        .load(out)
    )
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == [
        (10, "alpha"),
        (11, "beta"),
    ]
    # overwrite replaces previous files instead of accumulating
    df.limit(1).write.format("jsonl_docs").mode("overwrite").save(out)
    assert (
        registered.read.format("jsonl_docs")
        .schema("doc_id long, text string, lang string, source string, _corrupt string")
        .load(out)
        .count()
        == 1
    )
    assert not [f for f in os.listdir(out) if f.startswith("_tmp")]


def test_stream_tail_picks_up_new_files(registered, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    drop("000.jsonl", [{"doc_id": 1, "text": "a", "lang": "en", "source": "s"}])
    q = (
        registered.readStream.format("jsonl_docs")
        .load(str(src))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if registered.read.parquet(sink).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(1)
        drop("001.jsonl", [{"doc_id": 2, "text": "b", "lang": "de", "source": "s"}])
        while time.time() < deadline:
            try:
                if registered.read.parquet(sink).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    got = registered.read.parquet(sink)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]
