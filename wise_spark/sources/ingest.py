"""Corpus ingestion: Iceberg/parquet scan -> HTML extraction -> quarantine.

The front of the build lifecycle (SURVEY.md section 3.4): scan the web-page
table (url, warc_ts, html, text?, lang), run the deterministic extractor
over `html` (byte-identical per url — the input_hint invariant), and split
valid rows from quarantine (undecodable bytes / unsupported lang), counting
rejects like the reference does for invalid media
(/root/reference/extract-features.py:81-84).

Dedup of duplicate urls keeps the latest warc_ts (FIXTURES.md section 6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..analyzer import extract_text_udf


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan the source table. `fmt='iceberg'` works unchanged when an
    Iceberg catalog is on the classpath (this sandbox has none, so parquet
    paths stand in; the engine never assumes anything beyond a DataFrame)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


@dataclass
class IngestResult:
    docs: DataFrame        # (doc_id?, url, warc_ts, text, lang) — extracted, valid
    quarantine: DataFrame  # rejected rows with a `reject_reason` column


def ingest_html(
    corpus: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str = "warc_ts",
    lang_col: str | None = "lang",
    allowed_langs: list[str] | None = None,
    dedup_urls: bool = True,
) -> IngestResult:
    """html binary -> extracted text + quarantine split.

    Plan shape: one pandas-UDF projection (Arrow-batched), a window dedup on
    url (skipped when dedup_urls=False), and a cheap boolean split — no
    shuffles besides the optional dedup window.
    """
    extracted = corpus.withColumn("text_extracted", extract_text_udf()(F.col(html_col)))

    reject = F.when(F.col("text_extracted").isNull(), F.lit("invalid_utf8"))
    if lang_col is not None and allowed_langs is not None:
        # explicit NULL arm: ~isin(NULL) is NULL (three-valued logic), which
        # when() treats as false — an unfiltered NULL-lang doc would slip
        # past the language filter into the index
        reject = reject.when(
            F.col(lang_col).isNull() | ~F.col(lang_col).isin(allowed_langs),
            F.lit("lang_filtered"),
        )
    extracted = extracted.withColumn("reject_reason", reject)

    quarantine = extracted.filter(F.col("reject_reason").isNotNull()).drop(
        "text_extracted"
    )
    docs = (
        extracted.filter(F.col("reject_reason").isNull())
        .drop("reject_reason", html_col)
        .withColumnRenamed("text_extracted", "extracted_text")
    )
    if dedup_urls:
        w = Window.partitionBy(url_col).orderBy(F.desc(ts_col))
        docs = (
            docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return IngestResult(docs=docs, quarantine=quarantine)


def quarantine_counts(result: IngestResult) -> dict[str, int]:
    """Reject counts by reason (the reference reports skip counts,
    /root/reference/metadata.py:204-210)."""
    rows = result.quarantine.groupBy("reject_reason").count().collect()
    return {r["reject_reason"]: r["count"] for r in rows}
