"""Ingest lifecycle: byte-identical extraction, quarantine split + counts,
duplicate-url dedup keeping latest warc_ts (FIXTURES.md section 6)."""

from __future__ import annotations

import numpy as np
import pytest

from wise_spark.data.corpus import corpus_pandas
from wise_spark.sources import ingest_html
from wise_spark.sources.ingest import quarantine_counts


@pytest.fixture(scope="module")
def raw(spark):
    pdf = corpus_pandas(
        np.arange(120), seed=42, vocab_size=2000, invalid_every=20, dup_url_every=0
    )
    return spark.createDataFrame(pdf)


def test_ingest_split_and_byte_identity(spark, raw):
    res = ingest_html(raw, allowed_langs=["en", "de", "fr"])
    docs = res.docs.toPandas()
    q = quarantine_counts(res)
    # invalid_every=20 -> doc_ids 18,38,58,78,98,118 are undecodable
    assert q.get("invalid_utf8", 0) == 6
    assert q.get("lang_filtered", 0) > 0  # the 'zz' rows
    assert len(docs) + sum(q.values()) == 120
    # byte identity on every surviving row
    assert (docs["extracted_text"] == docs["text"]).all()


def test_ingest_dedups_urls_latest_wins(spark):
    pdf = corpus_pandas(np.arange(60), seed=42, vocab_size=2000, dup_url_every=10)
    raw = spark.createDataFrame(pdf)
    res = ingest_html(raw)
    docs = res.docs.toPandas()
    assert docs["url"].is_unique
    # dup rows point at the PREVIOUS doc's url with a later warc_ts ->
    # the later (duplicate) row must win
    dup_urls = pdf[pdf.duplicated("url", keep=False)]
    for url, grp in dup_urls.groupby("url"):
        kept = docs[docs["url"] == url]
        assert len(kept) == 1
        assert kept["warc_ts"].iloc[0] == grp["warc_ts"].max()


def test_ingest_no_lang_filter(spark, raw):
    res = ingest_html(raw)  # no allowed_langs -> only utf8 validity applies
    q = quarantine_counts(res)
    assert set(q) == {"invalid_utf8"}


def test_iceberg_source_dispatch_documented_blocker(spark, tmp_path):
    """read_corpus(fmt='iceberg') dispatches to spark.read.format('iceberg').
    The container carries no iceberg-spark-runtime jar and has no network to
    fetch one, so the end-to-end Iceberg round-trip cannot run here — this
    test pins the dispatch and the exact failure mode, and goes green
    end-to-end the moment the runtime jar is on the classpath."""
    import pytest

    from wise_spark.sources import read_corpus

    try:
        schema = read_corpus(spark, str(tmp_path), "iceberg").schema
    except Exception as e:  # noqa: BLE001 — asserting the failure class
        msg = str(e)
        assert "iceberg" in msg.lower() or "DATA_SOURCE_NOT_FOUND" in msg, msg
        pytest.skip("iceberg-spark-runtime jar absent in container "
                    "(documented environment blocker; no network)")
    else:  # jar present: this must not pass vacuously (r5 advice #3) —
        # prompt an upgrade to a real write+read round-trip assertion
        pytest.fail(
            "iceberg runtime available but read_corpus returned schema "
            f"{schema.simpleString()!r} with no round-trip assertion — "
            "upgrade this test to write+read an actual iceberg table"
        )
