"""Nested CAP-corpus adapter tests — reference explode/concat
semantics incl. null casebody and multi-opinion doc_id duplication
(SURVEY.md §7.4)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from searchengine_spark.index.bm25 import search, snippets
from searchengine_spark.index.builder import build_index
from searchengine_spark.index.corpus import (
    case_text,
    case_tokens,
    opinion_text_table,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField(
            "casebody",
            StructType(
                [
                    StructField(
                        "data",
                        StructType(
                            [
                                StructField(
                                    "opinions",
                                    ArrayType(
                                        StructType(
                                            [
                                                StructField("author", StringType()),
                                                StructField("text", StringType()),
                                                StructField("type", StringType()),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                    StructField("status", StringType()),
                ]
            ),
        ),
    ]
)


@pytest.fixture(scope="module")
def cap_docs(spark):
    rows = [
        # multi-opinion case: both opinions count toward one doc
        (1, "A v. B", {"data": {"opinions": [
            {"author": "J1", "text": "The murder trial was held in court", "type": "majority"},
            {"author": "J2", "text": "Murder charges were appealed", "type": "dissent"},
        ]}, "status": "ok"}),
        (2, "C v. D", {"data": {"opinions": [
            {"author": "J3", "text": "Contract breach claims in court", "type": "majority"},
        ]}, "status": "ok"}),
        # empty opinions array
        (3, "E v. F", {"data": {"opinions": []}, "status": "ok"}),
        # NULL casebody
        (4, "G v. H", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_case_text_concat_and_nulls(cap_docs):
    texts = {r.doc_id: r.text for r in case_text(cap_docs).collect()}
    assert texts[1] == "The murder trial was held in court Murder charges were appealed"
    assert texts[3] == ""  # empty opinions
    assert texts[4] == ""  # null casebody


def test_opinion_text_table_duplicates_doc_id(cap_docs):
    rows = opinion_text_table(cap_docs).collect()
    assert len(rows) == 3  # 2 opinions for case 1 + 1 for case 2
    assert sorted(r.doc_id for r in rows) == [1, 1, 2]


def test_index_and_search_nested_corpus(cap_docs):
    toks = case_tokens(cap_docs, stem=True)
    idx = build_index(toks, tokens=F.col("words"), cache_tokens=False)
    assert idx.scoring_params.collect()[0].n_docs == 2  # empty docs dropped

    res = search(idx, "murder", stem=True, k=5).collect()
    assert [r.doc_id for r in res] == [1]

    snip = snippets(
        search(idx, "murder", stem=True, k=5),
        opinion_text_table(cap_docs),
        text_col="opinion_text",
        max_len=20,
    ).collect()
    # multi-opinion doc: snippet takes first text (min), truncated
    assert snip[0].snippet == "Murder charges were "
