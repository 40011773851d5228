from .corpus import (
    CORPUS_SCHEMA,
    corpus_pandas,
    corpus_df,
    doc_tokens,
    doc_text,
    vocab,
)
from .queries import reference_queries

__all__ = [
    "CORPUS_SCHEMA",
    "corpus_pandas",
    "corpus_df",
    "doc_tokens",
    "doc_text",
    "vocab",
    "reference_queries",
]
