"""searchengine_spark — a PySpark-native analytics/search engine.

Re-implements the query semantics of the reference search engine
(abh2050/searchengine: tokenize -> inverted index -> BM25 -> top-k ->
snippet; see SURVEY.md) as idiomatic, scale-out Spark DataFrame code,
and extends it with the LLM-data-pipeline operators a 100 TB corpus
needs: deduplication (exact / MinHash-LSH / SimHash), similarity
search over embeddings, text analytics, and streaming event
aggregation.

Design rules (enforced throughout):
- DataFrame/SQL only; no RDDs.
- Built-in `pyspark.sql.functions` in every hot path; the only Python
  kernel is the optional Porter stemmer (Arrow-batched pandas_udf).
- Small dimension tables are broadcast; big joins/aggs shuffle on
  their natural keys; AQE is enabled by the session helper.
"""

from searchengine_spark.session import get_spark
from searchengine_spark.io import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
