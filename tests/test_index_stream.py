"""Streaming index maintenance: after replaying the corpus in
micro-batches, search over the incrementally-built index must equal
search over the batch-built index."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import search
from searchengine_spark.index.builder import build_index
from searchengine_spark.io import load_table
from searchengine_spark.streaming.index_stream import (
    read_incremental_index,
    start_index_maintenance,
)


def test_incremental_index_matches_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="se_stream_idx_")
    try:
        # Split the corpus into 4 files so the file stream replays it
        # as multiple micro-batches.
        src = os.path.join(tmp, "src")
        docs.repartition(4).write.parquet(src)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = os.path.join(tmp, "index")
        q = start_index_maintenance(
            stream, out, checkpoint_dir=os.path.join(tmp, "ckpt")
        )
        q.awaitTermination(120)

        inc = read_incremental_index(spark, out)
        batch = build_index(docs)

        assert inc.doc_lengths.count() == batch.doc_lengths.count()
        assert inc.term_frequencies.count() == batch.term_frequencies.count()

        p_inc = inc.scoring_params.collect()[0]
        p_b = batch.scoring_params.collect()[0]
        assert p_inc.n_docs == p_b.n_docs
        assert p_inc.avgdl == pytest.approx(p_b.avgdl)

        for query in ("spark join window fast", "merge sort"):
            a = [(r.doc_id, round(r.total_score, 9)) for r in search(inc, query, k=10).collect()]
            b = [(r.doc_id, round(r.total_score, 9)) for r in search(batch, query, k=10).collect()]
            assert a == b, query

        # Compaction: same answers from the bucketed layout.
        from searchengine_spark.streaming.index_stream import (
            compact_incremental_index,
        )

        compacted = compact_incremental_index(
            spark, out, os.path.join(tmp, "compacted")
        )
        c = [
            (r.doc_id, round(r.total_score, 9))
            for r in search(compacted, "spark join window fast", k=10).collect()
        ]
        b2 = [
            (r.doc_id, round(r.total_score, 9))
            for r in search(batch, "spark join window fast", k=10).collect()
        ]
        assert c == b2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS se_tf_compacted")


def test_duplicate_batch_append_is_idempotent(spark, sf_dir):
    """foreachBatch is at-least-once: appending the same batch twice
    must not change what read_incremental_index reports."""
    import pyspark.sql.functions as F

    from searchengine_spark.index.builder import build_index

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="se_retry_idx_")
    try:
        tokenized = docs.select(
            "doc_id", F.split(F.lower("text"), "[^a-z]+").alias("w")
        )
        # Write the per-doc facts TWICE (simulated batch retry).
        for _ in range(2):
            from searchengine_spark.streaming.index_stream import (
                start_index_maintenance,
            )
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 100)
                .parquet(sf_dir + "/documents.parque[t]")
            )
            q = start_index_maintenance(stream, tmp)  # no checkpoint -> replays
            q.awaitTermination(60)

        inc = read_incremental_index(spark, tmp)
        batch = build_index(docs)
        assert inc.doc_lengths.count() == batch.doc_lengths.count()
        assert inc.term_frequencies.count() == batch.term_frequencies.count()
        p_inc = inc.scoring_params.collect()[0]
        p_b = batch.scoring_params.collect()[0]
        assert p_inc.n_docs == p_b.n_docs
        assert p_inc.avgdl == pytest.approx(p_b.avgdl)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
