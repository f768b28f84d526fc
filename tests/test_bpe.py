"""BPE training pinned to a pure-Python reference implementation."""

import re
from collections import Counter

from searchengine_spark.text.bpe import END, encode_word, train_bpe


def _ref_train(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                vocab[w] += 1
    symed = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in symed.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # (count desc, left asc, right asc)
        (left, right), _n = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((left, right))
        for w, syms in symed.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symed[w] = out
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the newest of the new lows",
]


def test_train_matches_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = train_bpe(df, 8)
    want = _ref_train(TEXTS, 8)
    assert got == want
    assert len(got) == 8
    # classic BPE sanity: a frequent word ends up as few tokens
    enc = encode_word("newest", got)
    assert len(enc) < len("newest") + 1


def test_train_partitioning_invariant(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS * 3)), "doc_id long, text string"
    )
    a = train_bpe(df.coalesce(1), 5)
    b = train_bpe(df.repartition(7), 5)
    assert a == b


def test_encode_roundtrip_preserves_characters():
    merges = _ref_train(TEXTS, 6)
    for w in ("lowest", "newest", "zzz"):
        enc = encode_word(w, merges)
        assert "".join(enc).replace(END, "") == w
