"""Incremental (append-only) maintenance of the BM25 index.

The reference rebuilds its index from scratch on every corpus change
(/root/reference/searchenginespark.py:101-205 recomputes every
derived table from the raw corpus). At 100 TB a full rebuild
re-tokenizes and re-shuffles the entire corpus to absorb a batch
that's a fraction of a percent of it. This module appends a new
document batch touching only:

- the NEW batch at token granularity (tokenize + one (doc_id, word)
  shuffle over the batch alone),
- the base index's REDUCED tables: idf_values (vocabulary-sized),
  inverted_index (vocabulary + postings), doc_lengths (one row per
  doc) — never the base corpus's token stream.

All merge arithmetic is exact: document frequencies and lengths are
integer sums, n_docs is a count, and avgdl/idf are recomputed from
those exact integers with the same float expressions the full build
uses — so an incrementally-maintained index is bit-identical to a
full rebuild, and the registry proves it by hashing the incremental
result against the full-rebuild DuckDB oracle
(`se_index_incremental_idf` / `se_index_incremental_postings`).

Contract: batch doc_ids must be disjoint from the base corpus
(append-only). Updating/deleting docs needs a tombstone pass that
subtracts the old doc's contributions first — the same merge
arithmetic with negated counts; not implemented here because the
driver tables are append-shaped.

Relation to streaming/index_stream.py (the other maintenance path):
the streaming twin appends PER-DOC facts (tf, doc_length) per
micro-batch and derives idf/avgdl lazily at query time — right when
appends are frequent and queries tolerate an aggregate at read.
This module merges the MATERIALIZED vocabulary-level tables — right
when appends are batched and queries want idf/postings precomputed
(the serving layout write_index persists). Same index type out of
both; pick by append cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.index.builder import InvertedIndex, build_index


def append_to_index(base: InvertedIndex, new_docs: DataFrame, **build_kwargs) -> InvertedIndex:
    """Merge a new document batch into an existing index.

    ``build_kwargs`` pass through to build_index for the batch (same
    tokenizer options as the base build — mixing tokenizers across
    appends would corrupt the vocabulary).

    The batch build defaults to cache_tokens=False: build_index's
    cache is never unpersisted, so a long-lived serving session
    appending repeatedly would pin one cached token stream PER APPEND
    and eventually evict the hot index caches. Re-tokenizing the
    (small) batch once per derived table is the right trade here;
    pass cache_tokens=True explicitly for a huge one-off batch.
    """
    build_kwargs.setdefault("cache_tokens", False)
    batch = build_index(new_docs, **build_kwargs)

    term_frequencies = base.term_frequencies.unionByName(batch.term_frequencies)
    doc_lengths = base.doc_lengths.unionByName(batch.doc_lengths)
    flat_words = base.flat_words.unionByName(batch.flat_words)

    # Exact scalars from the per-doc table (integer sum / count —
    # O(docs), not O(tokens); combining the two 1-row avgdl frames
    # instead would round-trip through doubles and drift off the
    # full-rebuild value).
    scoring_params = doc_lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doc_length") / F.count(F.lit(1))).alias("avgdl"),
    )

    # df(t) merges as an integer sum over a vocabulary-sized full
    # outer join; idf is then the same log10(N/df) expression the
    # full build evaluates, over the new exact N.
    base_df = base.idf_values.select("word", F.col("doc_freq").alias("df_base"))
    batch_df = batch.idf_values.select("word", F.col("doc_freq").alias("df_new"))
    idf_values = (
        base_df.join(batch_df, "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce("df_base", F.lit(0)) + F.coalesce("df_new", F.lit(0))
            ).alias("doc_freq"),
        )
        .crossJoin(F.broadcast(scoring_params.select("n_docs")))
        .select(
            "word",
            "doc_freq",
            F.log10(F.col("n_docs") / F.col("doc_freq")).alias("idf"),
        )
    )

    # Postings merge: concat + re-sort per word. Batch doc_ids are
    # disjoint by contract, so concat never duplicates.
    empty = F.array().cast("array<bigint>")
    base_inv = base.inverted_index.select("word", F.col("doc_ids").alias("ids_base"))
    batch_inv = batch.inverted_index.select("word", F.col("doc_ids").alias("ids_new"))
    inverted_index = base_inv.join(batch_inv, "word", "full_outer").select(
        "word",
        F.sort_array(
            F.concat(F.coalesce("ids_base", empty), F.coalesce("ids_new", empty))
        ).alias("doc_ids"),
    )

    return InvertedIndex(
        term_frequencies=term_frequencies,
        doc_lengths=doc_lengths,
        idf_values=idf_values,
        inverted_index=inverted_index,
        scoring_params=scoring_params,
        flat_words=flat_words,
    )


# ------------------------------------------------------- registry glue

# The driver-checked split: ~90% of documents form the base corpus,
# every 10th doc arrives as the append batch. The oracles are the
# FULL-CORPUS index SQL — hash equality proves incremental == rebuild.
APPEND_MOD = 10


def _incremental_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    from searchengine_spark.io import load_table, session_cached

    def build() -> InvertedIndex:
        docs = load_table(spark, sf_dir, "documents")
        base = build_index(docs.filter(F.col("doc_id") % APPEND_MOD != 0))
        batch = docs.filter(F.col("doc_id") % APPEND_MOD == 0)
        # Deliberately .cache(), not .materialized() (r14): the
        # incremental index has exactly two consumers, each reading
        # ONE table — the eager four-table cut charged the first slot
        # ~3 extra materialization passes (bench 1.8 -> 5.9 s) while
        # the lazy cache builds only what is read; cold isolate A/B
        # showed the lineage cut bought nothing here.
        return append_to_index(base, batch).cache()

    return session_cached(spark, "inc_index", sf_dir, build)


def q_incremental_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _incremental_index(spark, sf_dir).idf_values.select(
        "word", "doc_freq", F.round("idf", 6).alias("idf")
    )


def q_incremental_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Postings as a joined string — deterministic, and immune to
    # array-representation differences between engines (same encoding
    # as se_inverted_index).
    return _incremental_index(spark, sf_dir).inverted_index.select(
        "word",
        F.size("doc_ids").alias("n_docs"),
        F.array_join("doc_ids", ",").alias("doc_ids_str"),
    )


QUERIES = {
    "se_index_incremental_idf": q_incremental_idf,
    "se_index_incremental_postings": q_incremental_postings,
}


def _full_rebuild_oracle(select: str) -> str:
    from searchengine_spark.index.queries import _INDEX_CTES

    return f"{_INDEX_CTES} {select}"


ORACLES = {
    "se_index_incremental_idf": _full_rebuild_oracle(
        "SELECT word, doc_freq, round(idf, 6) AS idf FROM idf"
    ),
    "se_index_incremental_postings": _full_rebuild_oracle(
        """
        SELECT word,
               CAST(count(DISTINCT doc_id) AS INT) AS n_docs,
               array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids_str
        FROM tok GROUP BY word
        """
    ),
}
