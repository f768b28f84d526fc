from searchengine_spark.index.builder import InvertedIndex, build_index
from searchengine_spark.index.bm25 import bm25_term_score, search

__all__ = ["InvertedIndex", "build_index", "bm25_term_score", "search"]
