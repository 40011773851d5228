"""Text analysis for training-data pipelines: token stats, quality features,
language-ID heuristic, document fingerprints.

All computations are expressible in both Spark DataFrame ops and ANSI SQL
(the driver's DuckDB oracle), so every function here has an exact oracle.
Tokenization here uses the ASCII fast path (runs of [a-z0-9] on lowered
text) — equal to the engine analyzer on ASCII corpora and expressible as
`regexp_extract_all` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ASCII_TOKEN_RE = "[a-z0-9]+"
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def _toks(text_col: str):
    # regexp_extract_all is JVM-side (whole-stage codegen) — no Python UDF
    return F.expr(f"regexp_extract_all(lower({text_col}), '{ASCII_TOKEN_RE}', 0)")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct) per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_toks(text_col)).alias("n_tokens"),
        F.size(F.array_distinct(_toks(text_col))).alias("n_distinct"),
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality scoring: length, lexical diversity, stopword ratio,
    mean token length — the usual web-corpus filters, rounded for stability."""
    toks = _toks(text_col)
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars_obs"),
        n.alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("type_token_ratio"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            )
            / n,
            6,
        ).alias("mean_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n, 6
        ).alias("stopword_ratio"),
    )


def lang_guess(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English stopword density threshold (the shape
    of an n-gram langid pass; deterministic and oracle-expressible)."""
    toks = _toks(text_col)
    sw = F.array([F.lit(s) for s in STOPWORDS])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(ratio, 6).alias("en_stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive bag fingerprint: md5 over the sorted distinct token
    list — catches shuffled/reordered near-copies (our corpus tie docs)."""
    toks = F.array_sort(F.array_distinct(_toks(text_col)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("bag_fingerprint"),
        F.md5(F.col(text_col)).alias("exact_fingerprint"),
    )
