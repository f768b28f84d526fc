from searchengine_spark.text.tokenizer import (
    STOPWORDS,
    tokens_column,
    tokenize_query,
    stem_tokens_udf,
)
from searchengine_spark.text.porter import porter_stem

__all__ = [
    "STOPWORDS",
    "tokens_column",
    "tokenize_query",
    "stem_tokens_udf",
    "porter_stem",
]
