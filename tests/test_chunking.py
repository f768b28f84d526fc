"""Chunking semantics: coverage, overlap, remainder windows."""

import pytest

from searchengine_spark.text.chunking import chunk_documents


def test_chunk_grid(spark):
    w26 = lambda i: "w" + chr(97 + i // 26) + chr(97 + i % 26)
    words = " ".join(w26(i) for i in range(95))
    docs = spark.createDataFrame([(1, words)], "doc_id bigint, text string")
    chunks = {
        r.chunk_id: r for r in chunk_documents(docs, chunk_size=50, overlap=10).collect()
    }
    # starts: 0, 40, 80 -> windows [0:50), [40:90), [80:95)
    assert sorted(chunks) == [0, 1, 2]
    assert chunks[0].n_tokens == 50 and chunks[0].chunk_text.startswith("waa")
    assert chunks[1].n_tokens == 50 and chunks[1].chunk_text.startswith(w26(40))
    assert chunks[2].n_tokens == 15 and chunks[2].chunk_text.startswith(w26(80))
    # overlap: chunk 0's last 10 tokens == chunk 1's first 10
    assert chunks[0].chunk_text.split()[-10:] == chunks[1].chunk_text.split()[:10]


def test_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id bigint, text string")
    rows = chunk_documents(docs, chunk_size=50, overlap=10).collect()
    assert len(rows) == 1
    assert rows[0].n_tokens == 3 and rows[0].chunk_id == 0


def test_every_token_covered(spark):
    w26 = lambda i: "t" + chr(97 + i // 26) + chr(97 + i % 26)
    words = " ".join(w26(i) for i in range(123))
    docs = spark.createDataFrame([(1, words)], "doc_id bigint, text string")
    rows = chunk_documents(docs, chunk_size=50, overlap=10).collect()
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split())
    assert len(covered) == 123


def test_no_redundant_trailing_chunk(spark):
    # n == chunk_size: the old grid emitted a second chunk fully
    # contained in the first (duplicate training text).
    w26 = lambda i: "d" + chr(97 + i // 26) + chr(97 + i % 26)
    docs = spark.createDataFrame(
        [(1, " ".join(w26(i) for i in range(50)))], "doc_id bigint, text string"
    )
    rows = chunk_documents(docs, chunk_size=50, overlap=10).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 50
    # n = 90: second chunk reaches the end; no third chunk.
    docs2 = spark.createDataFrame(
        [(1, " ".join(w26(i) for i in range(90)))], "doc_id bigint, text string"
    )
    rows2 = chunk_documents(docs2, chunk_size=50, overlap=10).collect()
    assert [r.n_tokens for r in sorted(rows2, key=lambda r: r.chunk_id)] == [50, 50]


def test_correction_records_dropped_terms(spark):
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.index.phrase import search_with_correction

    docs = spark.createDataFrame(
        [(1, "murder trial court")], "doc_id bigint, text string"
    )
    idx = build_index(docs, cache_tokens=False)
    res, corr = search_with_correction(idx, "zzzqqqxxx court")
    assert corr == {"zzzqqqxxx": None}
    assert res.count() == 1


def test_bad_params_rejected(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=10, overlap=10)


def test_chunk_exact_dedup_planted(spark):
    """Two docs sharing an identical 50-token prefix produce one
    duplicated chunk group with the lower (doc_id, chunk_id) canonical."""
    from searchengine_spark.text.chunking import chunk_documents, chunk_exact_dedup

    prefix = " ".join(f"tok{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(50))
    docs = spark.createDataFrame(
        [
            (7, prefix + " unique tail seven here now"),
            (9, prefix + " different ending nine words go"),
            (11, "completely unrelated text with no shared window at all"),
        ],
        "doc_id bigint, text string",
    )
    out = chunk_exact_dedup(chunk_documents(docs)).collect()
    assert len(out) == 1
    assert out[0].n_copies == 2
    assert out[0].canonical_doc_id == 7
    assert out[0].canonical_chunk_id == 0


def test_span_corruption_structure(spark):
    """Input/target reassemble the document: replacing each input
    sentinel with its target span must reproduce the token stream,
    and sentinel numbering must be 1..n_spans in order."""
    import re

    from searchengine_spark.text.chunking import span_corruption_examples

    # letters only: the tokenizer splits on non-alpha, so digit
    # suffixes would fragment the tokens
    text = " ".join(
        "tok" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(120)
    )
    df = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    r = span_corruption_examples(df).collect()[0]
    assert r.n_spans >= 1, "120 tokens at 15% should mask something"

    spans = {}
    pieces = re.split(r"<extra_id_(\d+)> ?", r.target_text)
    # pieces = ['', '1', 'tokA tokB ', '2', 'tokC ', ...]
    it = iter(pieces[1:])
    for sid, body in zip(it, it):
        spans[int(sid)] = body.strip()
    assert sorted(spans) == list(range(1, r.n_spans + 1))

    rebuilt = re.sub(
        r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r.input_text
    )
    assert rebuilt.split() == text.split(), "input+target do not rebuild the doc"
