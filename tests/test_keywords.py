"""Per-doc keyword extraction invariants."""

from searchengine_spark.index.keywords import TOP_KW, q_doc_keywords


def test_keywords_ranked_and_bounded_per_doc(spark, sf_dir):
    rows = q_doc_keywords(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, kws in by_doc.items():
        ranks = sorted(r["kw_rank"] for r in kws)
        assert ranks == list(range(1, len(kws) + 1)) and len(kws) <= TOP_KW
        ordered = sorted(kws, key=lambda r: r["kw_rank"])
        for a, b in zip(ordered, ordered[1:]):
            # rank follows (score desc, word asc)
            assert (a["kw_score"], b["word"]) >= (b["kw_score"], a["word"]), doc
        assert len({r["word"] for r in kws}) == len(kws)
