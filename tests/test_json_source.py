"""S1 coverage: JSONL ingestion with schema inference -> index ->
search, end to end (the reference's input format)."""

import json
import os
import shutil
import tempfile

from searchengine_spark.index.bm25 import highlight, search, snippets
from searchengine_spark.index.builder import build_index


def test_jsonl_ingest_index_search(spark):
    tmp = tempfile.mkdtemp(prefix="se_jsonl_")
    try:
        path = os.path.join(tmp, "docs.jsonl")
        with open(path, "w") as f:
            for i, text in enumerate(
                [
                    "the murder trial was held in superior court",
                    "contract breach claims were dismissed by the court",
                    "murder charges appealed to the supreme court",
                ]
            ):
                f.write(json.dumps({"doc_id": i, "text": text, "meta": {"src": "t"}}) + "\n")

        docs = spark.read.json(path)  # schema inference, incl. nested meta
        assert set(docs.columns) == {"doc_id", "text", "meta"}

        idx = build_index(docs, cache_tokens=False)
        res = search(idx, "murder", k=5)
        assert [r.doc_id for r in res.collect()] == [0, 2] or [
            r.doc_id for r in res.collect()
        ] == [2, 0]

        out = snippets(res, docs, text_col="text", max_len=100)
        marked = highlight(out, "snippet", "murder")
        snips = {r.doc_id: r.snippet for r in marked.collect()}
        assert "<mark>murder</mark>" in snips[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
