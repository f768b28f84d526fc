"""Record linkage: the two-pass blocking must have perfect recall for
the single-deletion error model (pigeonhole argument)."""

from searchengine_spark.io import load_table
from searchengine_spark.operators.linkage import (
    MAX_DIST,
    clean_entities,
    dirty_entities,
    q_record_linkage_pairs,
)


def test_every_dirty_record_links_to_its_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dirty_ids = {r["dirty_id"] for r in dirty_entities(docs).collect()}
    assert dirty_ids
    pairs = q_record_linkage_pairs(spark, sf_dir).collect()
    self_links = {r["dirty_id"] for r in pairs if r["clean_id"] == r["dirty_id"]}
    assert self_links == dirty_ids  # exact recall, no blocking misses
    for r in pairs:
        assert 0 <= r["dist"] <= MAX_DIST


def test_clean_names_long_enough_for_blocking(spark, sf_dir):
    from searchengine_spark.operators.linkage import BLOCK

    docs = load_table(spark, sf_dir, "documents")
    for r in clean_entities(docs).collect():
        assert len(r["name"]) >= 2 * BLOCK
