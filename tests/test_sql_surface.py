"""DataFrame-vs-SQL differential: both BM25 paths must agree
(mirrors the reference's pyapp.py vs SQL-prototype duality)."""

import pytest

from searchengine_spark.index.bm25 import search
from searchengine_spark.index.builder import build_index
from searchengine_spark.index.sql_surface import register_index_views, search_sql
from searchengine_spark.io import load_table


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    index = build_index(load_table(spark, sf_dir, "documents")).cache()
    register_index_views(spark, index)
    return index


@pytest.mark.parametrize(
    "terms", [["spark"], ["spark", "join", "window", "fast"], ["merge", "sort"]]
)
def test_sql_matches_dataframe_path(spark, idx, terms):
    df_res = [
        (r.doc_id, round(r.total_score, 9))
        for r in search(idx, terms, k=10).collect()
    ]
    sql_res = [
        (r.doc_id, round(r.total_score, 9))
        for r in search_sql(spark, terms, k=10).collect()
    ]
    assert df_res == sql_res


def test_sql_handles_unknown_terms(spark, idx):
    assert search_sql(spark, ["zzzznotaword"], k=10).count() == 0


def test_sql_terms_are_bound_not_interpolated(spark, sf_dir):
    """Hostile 'terms' must be treated as literal tokens — the
    reference's .format()-built IN-list (searchenginespark.py:231)
    would splice these into the statement; the bound-parameter path
    must neither error nor leak rows."""
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.index.sql_surface import (
        register_index_views,
        search_sql,
    )
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents"))
    register_index_views(spark, idx)
    hostile = [
        "') OR 1=1 --",
        "x'; DROP TABLE term_frequencies; --",
        "spark",  # one real term so the query is non-degenerate
    ]
    res = search_sql(spark, hostile, k=5).collect()
    # only the real term can match; the injection strings are inert
    legit = {r.doc_id for r in search_sql(spark, ["spark"], k=5).collect()}
    assert {r.doc_id for r in res} == legit
    # and the "dropped" view is still queryable
    assert spark.table("term_frequencies").count() > 0
