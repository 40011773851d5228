"""Analyzer unit tests: tokenizer goldens incl. Unicode, HTML byte-identity.

Mirrors the reference's golden-output discipline
(/root/reference/tests/test-kinetics-6.sh:124-142) and its unit-test style
(/root/reference/src/search/test_query_parser.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from wise_spark.analyzer import extract_text, tokenize_text
from wise_spark.data.corpus import corpus_pandas


def test_tokenizer_goldens():
    cases = {
        "Hello, World!": ["hello", "world"],
        "foo_bar baz": ["foo", "bar", "baz"],  # underscore separates
        "a1b2 33": ["a1b2", "33"],
        "MÜLLER müller Müller": ["müller", "müller", "müller"],  # casefold
        "straße STRASSE": ["strasse", "strasse"],  # casefold ß -> ss
        "café ＣＡＦＥ": ["café", "cafe"],  # NFKC fullwidth fold
        "": [],
        "  \t\n ": [],
        "don't": ["don", "t"],
    }
    for text, want in cases.items():
        assert tokenize_text(text) == want, text
    assert tokenize_text(None) == []


def test_tokenizer_query_doc_parity():
    # the analyzer-parity contract: query side == doc side on the same string
    s = "The QUICK brown-fox; jumps_over 42 times"
    assert tokenize_text(s) == tokenize_text(s)
    assert tokenize_text(s.upper()) == tokenize_text(s.lower())


def test_extract_text_goldens():
    html = (
        b"<html><head><title>My Title</title><script>skip();</script></head>"
        b"<body><nav>menu items</nav><p>  one   two </p><p>three</p>"
        b"<div>four <b>five</b></div></body></html>"
    )
    assert extract_text(html) == "My Title\none two\nthree\nfour five"
    assert extract_text(b"\xff\xfe broken") is None  # invalid UTF-8 -> quarantine
    assert extract_text(None) is None
    assert extract_text(b"plain text no tags") == "plain text no tags"
    assert extract_text(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_corpus_extraction_byte_identity():
    """input_hint invariant: extract_text(html) == text, byte-identical per url."""
    pdf = corpus_pandas(np.arange(200), seed=42, vocab_size=2000)
    for _, row in pdf.iterrows():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_corpus_quarantine_and_boilerplate():
    pdf = corpus_pandas(np.arange(50), seed=42, vocab_size=2000, invalid_every=10)
    bad = [extract_text(h) for h in pdf["html"]]
    assert bad.count(None) == 5  # doc_ids 8,18,28,38,48
    # boilerplate must never leak into extracted text
    good = corpus_pandas(np.arange(50), seed=42, vocab_size=2000)
    from wise_spark.data.corpus import _boiler_tokens, vocab  # noqa: PLC2701

    v = vocab(2000)
    for i, row in good.iterrows():
        boiler = set(_boiler_tokens(int(i), 42, v))
        text_toks = set(row["text"].split())
        # boiler words may coincide with body words by chance; assert the
        # *specific boilerplate string* is absent instead
        assert " ".join(_boiler_tokens(int(i), 42, v)) not in row["text"] or len(boiler) <= 1


def test_corpus_determinism_any_order():
    a = corpus_pandas(np.arange(100), seed=42, vocab_size=2000)
    b = corpus_pandas(np.arange(100)[::-1], seed=42, vocab_size=2000)
    b = b.iloc[::-1].reset_index(drop=True)
    assert a.equals(b)


def test_corpus_ties_exist():
    # doc_id % 101 == 100 -> same body token multiset as doc_id - 1
    from wise_spark.data.corpus import doc_tokens

    assert sorted(doc_tokens(100, 42, 2000)) == sorted(doc_tokens(99, 42, 2000))
    assert sorted(doc_tokens(201, 42, 2000)) == sorted(doc_tokens(200, 42, 2000))
    assert doc_tokens(100, 42, 2000) != doc_tokens(99, 42, 2000)  # order differs


def test_extract_udf_matches_local(spark):
    pdf = corpus_pandas(np.arange(60), seed=42, vocab_size=2000, invalid_every=13)
    sdf = spark.createDataFrame(pdf[["url", "html", "text"]])
    from pyspark.sql import functions as F

    from wise_spark.analyzer import extract_text_udf

    out = (
        sdf.withColumn("extracted", extract_text_udf()(F.col("html")))
        .select("url", "text", "extracted", "html")
        .toPandas()
    )
    for _, r in out.iterrows():
        assert r["extracted"] == extract_text(bytes(r["html"]))
