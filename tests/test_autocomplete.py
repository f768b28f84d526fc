"""Autocomplete table contract: true prefixes, dense ranks, df order."""

from collections import defaultdict

from searchengine_spark.index.autocomplete import (
    MAX_PREFIX,
    TOP_N,
    q_autocomplete_table,
)


def test_autocomplete_contract(spark, sf_dir):
    rows = q_autocomplete_table(spark, sf_dir).collect()
    assert rows
    by_prefix = defaultdict(list)
    for r in rows:
        assert 1 <= len(r["prefix"]) <= MAX_PREFIX
        assert r["word"].startswith(r["prefix"])
        assert 1 <= r["completion_rank"] <= TOP_N
        by_prefix[r["prefix"]].append((r["completion_rank"], r["doc_freq"], r["word"]))
    for prefix, entries in by_prefix.items():
        entries.sort()
        # dense ranks starting at 1
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1))
        # df non-increasing with rank; ties broken by word asc
        for (r1, d1, w1), (r2, d2, w2) in zip(entries, entries[1:]):
            assert d1 > d2 or (d1 == d2 and w1 < w2)
