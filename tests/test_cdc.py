"""Content-defined chunking: cover invariants and the edit-
re-alignment property that is CDC's entire reason to exist."""

import hashlib

from searchengine_spark.text.cdc import TARGET, WINDOW, cdc_chunks, dup_chunks


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in cdc_chunks(df).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_md5"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_chunks_cover_document_exactly(spark):
    import random

    rng = random.Random(2)
    text = "".join(rng.choice("abcdefgh ") for _ in range(3000))
    [chunks] = _chunks(spark, [(1, text)]).values()
    # contiguous, gap-free cover
    pos = 1
    for i, (idx, start, ln, md5) in enumerate(chunks):
        assert idx == i and start == pos and ln > 0
        assert md5 == hashlib.md5(
            text[start - 1 : start - 1 + ln].encode()
        ).hexdigest()
        pos += ln
    assert pos == len(text) + 1
    # expected chunk length ~ TARGET: loose 4x sanity band
    avg = len(text) / len(chunks)
    assert TARGET / 4 < avg < TARGET * 4


def test_edit_realigns_downstream_chunks(spark):
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    edited = text[:100] + "X" + text[100:]  # 1-char insertion
    got = _chunks(spark, [(1, text), (2, edited)])
    h1 = {c[3] for c in got[1]}
    h2 = {c[3] for c in got[2]}
    # every chunk fully past the edit's window re-aligns byte-for-byte;
    # only the O(1) chunks touching the edit may differ.
    shared = h1 & h2
    assert len(shared) >= len(h1) - 3
    # and the tail chunk hashes match in order
    tail1 = [c[3] for c in got[1]][-5:]
    tail2 = [c[3] for c in got[2]][-5:]
    assert tail1 == tail2


def test_short_null_and_empty_docs(spark):
    got = _chunks(
        spark, [(1, "tiny"), (2, ""), (3, None), (4, "x" * (WINDOW - 1))]
    )
    assert got.get(2) is None and got.get(3) is None  # no chunks
    assert got[1] == [(0, 1, 4, hashlib.md5(b"tiny").hexdigest())]
    assert len(got[4]) == 1 and got[4][0][2] == WINDOW - 1


def test_dup_chunks_find_planted_share(spark):
    import random

    rng = random.Random(9)
    core = "".join(rng.choice("abcdefgh ") for _ in range(1000))
    rows = [
        (1, "PREFIX-ONE " + core),
        (2, "a totally different lead-in text " + core),
        (3, "unrelated " + "".join(rng.choice("qrstuv ") for _ in range(900))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dups = dup_chunks(cdc_chunks(df)).collect()
    assert len(dups) >= 3  # the shared core yields re-aligned dup chunks
    assert all(r["n_docs"] == 2 for r in dups)  # doc 3 shares nothing
