"""Inverted-index build: staged, checkpointed, skew-salted, resumable.

Lifecycle (SURVEY.md section 3.4), each stage an atomic parquet commit whose
_SUCCESS marker is the checkpoint (the reference commits every 8192 payloads
for the same reason, /root/reference/extract-features.py:320,400-405):

  Stage A  tokens    docs -> tokenize pandas_udf -> (doc_id, term, tf, doclen,
                     shard) parquet, partitioned by shard  [extracted snapshot]
  Stage B  doc_map   (doc_id, url?, doclen) parquet + exact N/avgdl
  Stage C  segments  per shard-wave: salted two-phase groupBy -> varbyte +
                     block-max posting rows, appended per wave with a lineage
                     row (tokens/postings/bytes/wall_ms) committed after each
                     wave -> restart skips completed waves
  Stage D  terms     exact df(term) table, range-partitioned + sorted for
                     parquet min/max pruning on query terms
  meta.json          written LAST = build-complete marker

Skew handling (north_rule): the posting groupBy key is (shard, bucket) where
shard = doc_id % n_shards — a head term's postings split across ALL shards —
plus an explicit salt = xxhash64(doc_id) % n_salts two-phase partial
aggregation inside each (shard, bucket), so no single reducer ever owns a
head term (SURVEY.md section 7 hard-part 2). Zipf df makes this mandatory at
10^12 docs; AQE cannot fix groupBy skew, only join skew.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .codec import encode_postings

TOKENS_SCHEMA = "doc_id long, term string, tf long, doclen long, shard int"
PARTIAL_SCHEMA = (
    "term string, shard int, bucket int, docids binary, tfs binary, doclens binary"
)
SEGMENT_SCHEMA = (
    "term string, shard int, n long, docids binary, tfs binary, doclens binary, "
    "blk_last array<long>, blk_max array<double>, max_tfc double, sum_tf long"
)
LINEAGE_SCHEMA = (
    "stage string, unit string, status string, rows long, bytes long, wall_ms long"
)


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    total_tokens: int
    n_terms: int
    n_shards: int
    n_buckets: int
    n_salts: int
    k1: float = 1.2
    b: float = 0.75
    version: int = 1
    extras: dict = field(default_factory=dict)

    def save(self, index_dir: str) -> None:
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(asdict(self), f, indent=1)

    @classmethod
    def load(cls, index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "meta.json")) as f:
            return cls(**json.load(f))


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _append_lineage(spark: SparkSession, index_dir: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(index_dir, "lineage")
    )


def _completed_units(spark: SparkSession, index_dir: str, stage: str) -> set[str]:
    p = os.path.join(index_dir, "lineage")
    if not os.path.exists(p):
        return set()
    rows = (
        spark.read.parquet(p)
        .filter((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("unit")
        .collect()
    )
    return {r["unit"] for r in rows}


def _pack_partial_fn(n_salts: int):
    """Phase 1: pack one (shard,bucket,salt) group into per-term raw runs."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        out = []
        for term, g in pdf.groupby("term", sort=False):
            out.append(
                (
                    term,
                    int(g["shard"].iat[0]),
                    int(g["bucket"].iat[0]),
                    g["doc_id"].to_numpy(np.int64).tobytes(),
                    g["tf"].to_numpy(np.int32).tobytes(),
                    g["doclen"].to_numpy(np.int32).tobytes(),
                )
            )
        return pd.DataFrame(
            out, columns=["term", "shard", "bucket", "docids", "tfs", "doclens"]
        )

    return pack


def _merge_encode_fn(avgdl: float):
    """Phase 2: k-way merge the salted partial runs per term, then encode.

    Partial runs are each sorted by doc_id but interleave (salt is a hash of
    doc_id), so the merge is a sorted k-way combine; doc_ids are unique across
    partials by construction ((doc_id, term) rows are unique), enforced by
    encode_postings' strictly-ascending contract.
    """

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for term, g in pdf.groupby("term", sort=True):
            ids = np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in g["docids"]]
            )
            tfs = np.concatenate([np.frombuffer(b, dtype=np.int32) for b in g["tfs"]])
            dls = np.concatenate(
                [np.frombuffer(b, dtype=np.int32) for b in g["doclens"]]
            )
            order = np.argsort(ids, kind="mergesort")
            enc = encode_postings(ids[order], tfs[order], dls[order], avgdl)
            out.append(
                (
                    term,
                    int(g["shard"].iat[0]),
                    enc["n"],
                    enc["docids"],
                    enc["tfs"],
                    enc["doclens"],
                    enc["blk_last"],
                    enc["blk_max"],
                    enc["max_tfc"],
                    enc["sum_tf"],
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "term", "shard", "n", "docids", "tfs", "doclens",
                "blk_last", "blk_max", "max_tfc", "sum_tf",
            ],
        )

    return merge


def build_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    n_shards: int | None = None,
    n_buckets: int = 32,
    n_salts: int = 4,
    n_waves: int = 4,
    resume: bool = True,
    fail_after_waves: int | None = None,  # test hook: simulate a mid-build kill
) -> IndexMeta:
    spark = docs.sparkSession
    os.makedirs(index_dir, exist_ok=True)
    from ..analyzer import tokenize_udf

    tokens_path = os.path.join(index_dir, "tokens")
    doc_map_path = os.path.join(index_dir, "doc_map")
    segments_path = os.path.join(index_dir, "segments")
    terms_path = os.path.join(index_dir, "terms")

    # ---- Stage A: tokenize -> tf rows, partitioned by shard -----------------
    if n_shards is None:
        n_docs_hint = docs.count()
        n_shards = max(4, min(4096, int(n_docs_hint // 250_000) + 4))
    if not (resume and _done(tokens_path)):
        t0 = time.time()
        tokenize = tokenize_udf()
        toks = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokenize(F.col(text_col)).alias("toks"),
        ).withColumn("doclen", F.size("toks"))
        tf = (
            toks.select("doc_id", "doclen", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("doclen").alias("doclen"))
            .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
        )
        tf.write.mode("overwrite").partitionBy("shard").parquet(tokens_path)
        _append_lineage(
            spark, index_dir,
            [("tokens", "-", "done", 0, 0, int((time.time() - t0) * 1000))],
        )

    # ---- Stage B: doc_map + exact corpus stats ------------------------------
    if not (resume and _done(doc_map_path)):
        t0 = time.time()
        tokenize = tokenize_udf()
        cols = [F.col(id_col).cast("long").alias("doc_id")]
        if url_col:
            cols.append(F.col(url_col).alias("url"))
        dm = docs.select(
            *cols, F.size(tokenize(F.col(text_col))).alias("doclen")
        )
        dm.write.mode("overwrite").parquet(doc_map_path)
        _append_lineage(
            spark, index_dir,
            [("doc_map", "-", "done", 0, 0, int((time.time() - t0) * 1000))],
        )
    dm = spark.read.parquet(doc_map_path)
    srow = dm.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total"),
    ).collect()[0]
    n_docs, avgdl = int(srow["n"]), float(srow["avgdl"] or 0.0)
    total_tokens = int(srow["total"] or 0)

    # ---- Stage C: salted two-phase posting build, per shard-wave ------------
    done_units = _completed_units(spark, index_dir, "segments") if resume else set()
    waves = [list(range(w, n_shards, n_waves)) for w in range(n_waves)]
    tf_all = spark.read.parquet(tokens_path)
    for w, shard_list in enumerate(waves):
        unit = f"wave-{w}"
        if unit in done_units:
            continue
        if fail_after_waves is not None and w >= fail_after_waves:
            raise RuntimeError(f"injected failure before {unit}")
        t0 = time.time()
        tf = tf_all.filter(F.col("shard").isin(shard_list))  # partition pruning
        tf = tf.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        ).withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int")
        )
        partial = tf.groupBy("shard", "bucket", "salt").applyInPandas(
            _pack_partial_fn(n_salts), schema=PARTIAL_SCHEMA
        )
        segs = partial.groupBy("shard", "bucket").applyInPandas(
            _merge_encode_fn(avgdl), schema=SEGMENT_SCHEMA
        )
        segs.write.mode("append").partitionBy("shard").parquet(segments_path)
        written = spark.read.parquet(segments_path).filter(
            F.col("shard").isin(shard_list)
        )
        m = written.agg(
            F.sum("n").alias("postings"),
            (F.sum(F.octet_length("docids")) + F.sum(F.octet_length("tfs"))
             + F.sum(F.octet_length("doclens"))).alias("bytes"),
        ).collect()[0]
        _append_lineage(
            spark, index_dir,
            [("segments", unit, "done", int(m["postings"] or 0),
              int(m["bytes"] or 0), int((time.time() - t0) * 1000))],
        )

    # ---- Stage D: exact term df table (range-partitioned, sorted) -----------
    if not (resume and _done(terms_path)):
        t0 = time.time()
        terms = (
            spark.read.parquet(segments_path)
            .groupBy("term")
            .agg(F.sum("n").alias("df"), F.max("max_tfc").alias("max_tfc"))
        )
        (
            terms.repartitionByRange(max(2, n_buckets // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(terms_path)
        )
        _append_lineage(
            spark, index_dir,
            [("terms", "-", "done", 0, 0, int((time.time() - t0) * 1000))],
        )

    n_terms = spark.read.parquet(terms_path).count()
    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        total_tokens=total_tokens,
        n_terms=n_terms,
        n_shards=n_shards,
        n_buckets=n_buckets,
        n_salts=n_salts,
    )
    meta.save(index_dir)  # build-complete marker, written last
    return meta
