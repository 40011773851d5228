"""Inverted-index build: staged, checkpointed, skew-safe, resumable.

Lifecycle (SURVEY.md section 3.4), each stage an atomic parquet commit whose
_SUCCESS marker is the checkpoint (the reference commits every 8192 payloads
for the same reason, /root/reference/extract-features.py:320,400-405):

  Stage A  tokens    docs -> flat mapInPandas tokenize -> (doc_id, term, tf,
                     doclen, shard) parquet partitioned by WAVE, written
                     straight from the map tasks — ZERO shuffles. The UDF
                     emits flat Arrow columns (no array<struct> the JVM would
                     have to explode: measured, nested UDF output + same-stage
                     write anti-scales 4x on this box).
  Stage B  doc_map   (doc_id, url?, doclen) parquet + exact N/avgdl
  Stage C  segments  per wave: pack-on-read partials (map-side, split-local)
                     -> ONE shuffle of packed binary runs keyed (shard,
                     bucket) -> k-way merge + varbyte/block-max encode ->
                     direct partitioned write, with a lineage row
                     (postings/bytes/wall_ms) committed after each wave ->
                     restart skips completed waves
  Stage D  terms     exact df(term) table, range-partitioned + sorted for
                     parquet min/max pruning on query terms
  meta.json          written LAST = build-complete marker

Skew handling (north_rule): the posting shuffle key is (shard, bucket) where
shard = doc_id % n_shards — a head term's postings split across ALL shards —
and phase 1 packs PARTIAL runs per (shard, term) inside each input split
BEFORE the shuffle (the moral equivalent of salting with salt = split id,
minus the salt shuffle): no reducer ever receives raw per-posting rows, only
<= n_splits packed runs per (shard, term), each bounded by its split's size
(SURVEY.md section 7 hard-part 2). Zipf df makes this mandatory at 10^12
docs; AQE cannot fix groupBy skew, only join skew.

Total exchanges for the whole build: one packed-run shuffle per wave, plus
the small doc_map/terms aggregations. No raw token row is ever shuffled.
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
# wave = shard % n_waves (Stage C prunes whole wave dirs); url rides along on
# one SENTINEL row per doc (term NULL, tf 0) so Stage B derives doc_map with
# a map-only filter — no groupBy, no join-back to the source table.
# positions: raw little-endian int32 token offsets (NULL unless the build
# runs with_positions=True); segments re-encode them varbyte+delta.
TOKENS_WAVE_SCHEMA = TOKENS_SCHEMA + ", wave int, url string, positions binary"
PARTIAL_SCHEMA = (
    "term string, shard int, bucket int, docids binary, tfs binary, "
    "doclens binary, positions binary"
)
SEGMENT_SCHEMA = (
    "term string, shard int, n long, docids binary, tfs binary, doclens binary, "
    "positions binary, blk_last array<long>, blk_max array<double>, "
    "max_tfc double, sum_tf long"
)
LINEAGE_SCHEMA = (
    "stage string, unit string, status string, rows long, bytes long, wall_ms long"
)

# above this many doc_map rows, corpus stats switch from a driver-side
# pyarrow column read to a distributed Spark aggregation (same exact result)
DRIVER_STATS_MAX_ROWS = 50_000_000


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


_LINEAGE_COLS = ["stage", "unit", "status", "rows", "bytes", "wall_ms"]


def _append_lineage(spark: SparkSession, index_dir: str, rows: list[tuple]) -> None:
    """Driver-side transactional bookkeeping — written directly with pyarrow
    (a one-row Spark job costs seconds of python-worker spin-up; the manifest
    is metadata, not data). Files are write-once; readers see a row only
    after its file fully exists (the commit point)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(index_dir, "lineage")
    os.makedirs(p, exist_ok=True)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "stage": pa.array(cols[0], pa.string()),
            "unit": pa.array(cols[1], pa.string()),
            "status": pa.array(cols[2], pa.string()),
            "rows": pa.array(cols[3], pa.int64()),
            "bytes": pa.array(cols[4], pa.int64()),
            "wall_ms": pa.array(cols[5], pa.int64()),
        }
    )
    tmp = os.path.join(p, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(p, f"manifest-{uuid.uuid4().hex}.parquet"))


def _completed_units(spark: SparkSession, index_dir: str, stage: str) -> set[str]:
    import pyarrow.parquet as pq

    p = os.path.join(index_dir, "lineage")
    if not os.path.exists(p):
        return set()
    out: set[str] = set()
    for fn in os.listdir(p):
        if not fn.endswith(".parquet") or fn.startswith("."):
            continue
        t = pq.read_table(os.path.join(p, fn), columns=["stage", "unit", "status"])
        for s, u, st in zip(*(t.column(c).to_pylist() for c in ("stage", "unit", "status"))):
            if s == stage and st == "done":
                out.add(u)
    return out


def _concat_batches(batches) -> pd.DataFrame | None:
    parts = [p for p in batches if len(p)]
    if not parts:
        return None
    return pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]


def _group_bounds(*key_arrays: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of equal-key runs over pre-sorted parallel arrays."""
    n = key_arrays[0].shape[0]
    change = np.zeros(n - 1, dtype=bool) if n > 1 else np.zeros(0, dtype=bool)
    for a in key_arrays:
        change |= a[1:] != a[:-1]
    idx = np.flatnonzero(change) + 1
    return np.r_[0, idx], np.r_[idx, n]


def _wave_metrics(segments_path: str, shard_list: list[int]) -> tuple[int, int]:
    """Per-wave lineage metrics from parquet footers + one tiny column read
    (no Spark job): postings = sum of 'n'; bytes = compressed payload size of
    the three varbyte columns from column-chunk metadata."""
    import pyarrow.parquet as pq

    postings = 0
    nbytes = 0
    payload_cols = {"docids", "tfs", "doclens"}
    for s in shard_list:
        d = os.path.join(segments_path, f"shard={s}")
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            if not fn.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(d, fn))
            t = pf.read(columns=["n"])
            postings += int(t.column("n").to_pandas().sum())
            md = pf.metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema in payload_cols:
                        nbytes += col.total_compressed_size
    return postings, nbytes


def _flat_tokens_fn(
    id_col: str, text_col: str, url_col: str | None, n_shards: int, n_waves: int,
    with_positions: bool = False,
):
    """Stage A kernel: mapInPandas batches of (id, text[, url]) -> FLAT rows
    (doc_id, term, tf, doclen, shard, wave, url).

    Map-side tf: a document's term frequencies are purely local, counted here
    with one vectorized pandas groupby per Arrow batch — the build never
    shuffles a raw token. Output is flat primitive/string columns: emitting
    array<struct<term,tf>> and exploding JVM-side measurably anti-scales
    (nested Arrow vectors + same-stage explode+write quadruple wall time at
    8 cores on this box), so flat-by-construction is both the simpler and
    the faster shape.

    One sentinel row per doc (term NULL, tf 0, url set) makes doc_map a pure
    filter of this checkpoint — zero-token docs included.
    """
    from itertools import chain

    from ..analyzer.tokenizer import tokenize_text

    cols = ["doc_id", "term", "tf", "doclen", "shard", "wave", "url", "positions"]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            toks_per_doc = [tokenize_text(t) for t in pdf[text_col]]
            lens = np.fromiter(
                (len(t) for t in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
            )
            doc_ids = pdf[id_col].to_numpy(np.int64)
            flat = pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_ids, lens),
                    "term": list(chain.from_iterable(toks_per_doc)),
                    "doclen": np.repeat(lens, lens),
                }
            )
            if with_positions:
                # per-doc token offset, then numpy group slicing (stable sort
                # keeps offsets ascending within each (doc, term) group)
                total = int(lens.sum())
                pos = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(lens) - lens, lens
                )
                flat["pos"] = pos
                flat = flat.sort_values(["doc_id", "term"], kind="mergesort",
                                        ignore_index=True)
                d = flat["doc_id"].to_numpy(np.int64)
                t = flat["term"].to_numpy()
                p32 = flat["pos"].to_numpy(np.int64).astype(np.int32)
                starts, ends = _group_bounds(d, t)
                pbytes = p32.tobytes()
                out = pd.DataFrame(
                    {
                        "doc_id": d[starts],
                        "term": t[starts],
                        "tf": (ends - starts).astype(np.int64),
                        "doclen": flat["doclen"].to_numpy(np.int64)[starts],
                        "positions": [
                            pbytes[4 * s:4 * e] for s, e in zip(starts, ends)
                        ],
                    }
                )
            else:
                out = flat.groupby(["doc_id", "term"], sort=False, as_index=False).agg(
                    tf=("term", "size"), doclen=("doclen", "first")
                )
                out["tf"] = out["tf"].astype(np.int64)
                out["positions"] = None
            out["url"] = None
            sent = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "term": None,
                    "tf": np.int64(0),
                    "doclen": lens,
                    "url": pdf[url_col].to_numpy() if url_col else None,
                    "positions": None,
                }
            )
            out = pd.concat([out, sent], ignore_index=True)
            out["shard"] = (out["doc_id"] % n_shards).astype(np.int32)
            out["wave"] = (out["shard"] % n_waves).astype(np.int32)
            yield out[cols]

    return gen


def _pack_partition_fn(with_positions: bool = False):
    """Phase 1 (split-local partials): one pass per INPUT SPLIT — sort by
    (shard, term, doc_id), split runs with numpy boundary detection, pack raw
    little-endian buffers. Runs map-side directly on the pruned wave scan (no
    shuffle): each split yields at most one partial run per (shard, term), so
    a head term fans out into n_splits bounded partials instead of one
    unbounded reducer row."""

    def pack(batches):
        pdf = _concat_batches(batches)
        if pdf is None:
            return
        pdf = pdf.sort_values(["shard", "term", "doc_id"], kind="mergesort", ignore_index=True)
        shard = pdf["shard"].to_numpy(np.int32)
        bucket = pdf["bucket"].to_numpy(np.int32)
        terms = pdf["term"].to_numpy()
        ids = np.ascontiguousarray(pdf["doc_id"].to_numpy(np.int64))
        tfs = np.ascontiguousarray(pdf["tf"].to_numpy(np.int32))
        dls = np.ascontiguousarray(pdf["doclen"].to_numpy(np.int32))
        starts, ends = _group_bounds(shard, terms)
        if with_positions:
            pos = pdf["positions"].to_numpy()
            rows = [
                (
                    terms[s], int(shard[s]), int(bucket[s]),
                    ids[s:e].tobytes(), tfs[s:e].tobytes(), dls[s:e].tobytes(),
                    b"".join(pos[s:e]),  # doc-ascending, aligned with tfs
                )
                for s, e in zip(starts, ends)
            ]
        else:
            rows = [
                (
                    terms[s], int(shard[s]), int(bucket[s]),
                    ids[s:e].tobytes(), tfs[s:e].tobytes(), dls[s:e].tobytes(),
                    None,
                )
                for s, e in zip(starts, ends)
            ]
        yield pd.DataFrame(
            rows,
            columns=["term", "shard", "bucket", "docids", "tfs", "doclens", "positions"],
        )

    return pack


def _merge_partition_fn(avgdl: float, with_positions: bool = False):
    """Phase 2: k-way merge the split-local partial runs per (shard, term),
    then varbyte+block-max encode. Partials are each doc_id-sorted but
    interleave across splits, so the merge is a sorted combine; (doc_id,
    term) uniqueness is enforced by encode_postings' strictly-ascending
    contract. Position blocks (raw int32, aligned to postings via tf) are
    permuted with the same doc order, then delta+varbyte encoded."""

    def merge(batches):
        from .codec import encode_postings_many

        pdf = _concat_batches(batches)
        if pdf is None:
            return
        pdf = pdf.sort_values(["shard", "term"], kind="mergesort", ignore_index=True)
        shard = pdf["shard"].to_numpy(np.int32)
        terms = pdf["term"].to_numpy()
        d_ids = pdf["docids"].to_numpy()
        d_tfs = pdf["tfs"].to_numpy()
        d_dls = pdf["doclens"].to_numpy()
        d_pos = pdf["positions"].to_numpy() if with_positions else None
        g_starts, g_ends = _group_bounds(shard, terms)
        # merge the partials per (shard, term) into one big sorted
        # concatenation, then encode EVERY list in one vectorized pass
        ids_parts, tfs_parts, dls_parts, pos_parts, lens = [], [], [], [], []
        for s, e in zip(g_starts, g_ends):
            if e - s == 1:
                ids = np.frombuffer(d_ids[s], dtype=np.int64)
                tfs = np.frombuffer(d_tfs[s], dtype=np.int32).astype(np.int64)
                dls = np.frombuffer(d_dls[s], dtype=np.int32).astype(np.int64)
                pos = (np.frombuffer(d_pos[s], dtype=np.int32).astype(np.int64)
                       if with_positions else None)
                if not (ids[1:] > ids[:-1]).all():
                    order = np.argsort(ids, kind="mergesort")
                    ids, tfs, dls, pos = _permute(ids, tfs, dls, pos, order)
            else:
                ids = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in d_ids[s:e]])
                tfs = np.concatenate([np.frombuffer(b, dtype=np.int32) for b in d_tfs[s:e]]).astype(np.int64)
                dls = np.concatenate([np.frombuffer(b, dtype=np.int32) for b in d_dls[s:e]]).astype(np.int64)
                pos = (np.concatenate([np.frombuffer(b, dtype=np.int32) for b in d_pos[s:e]]).astype(np.int64)
                       if with_positions else None)
                order = np.argsort(ids, kind="mergesort")
                ids, tfs, dls, pos = _permute(ids, tfs, dls, pos, order)
            ids_parts.append(ids)
            tfs_parts.append(tfs)
            dls_parts.append(dls)
            if with_positions:
                pos_parts.append(pos)
            lens.append(ids.size)
        lens = np.asarray(lens, dtype=np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        encs = encode_postings_many(
            np.concatenate(ids_parts), np.concatenate(tfs_parts),
            np.concatenate(dls_parts), starts, ends, avgdl,
            positions=np.concatenate(pos_parts) if with_positions else None,
        )
        out = [
            (
                terms[s], int(shard[s]), enc["n"], enc["docids"], enc["tfs"],
                enc["doclens"], enc["positions"], enc["blk_last"],
                enc["blk_max"], enc["max_tfc"], enc["sum_tf"],
            )
            for (s, enc) in zip(g_starts, encs)
        ]
        yield pd.DataFrame(
            out,
            columns=[
                "term", "shard", "n", "docids", "tfs", "doclens", "positions",
                "blk_last", "blk_max", "max_tfc", "sum_tf",
            ],
        )

    return merge


def _permute(ids, tfs, dls, pos, order):
    """Reorder postings by `order`; position BLOCKS (variable length, tf each)
    move with their posting via a vectorized block gather."""
    new_pos = None
    if pos is not None:
        src_off = np.cumsum(tfs) - tfs
        ord_tfs = tfs[order]
        dst_base = np.cumsum(ord_tfs) - ord_tfs
        within = np.arange(int(tfs.sum()), dtype=np.int64) - np.repeat(dst_base, ord_tfs)
        gather = np.repeat(src_off[order], ord_tfs) + within
        new_pos = pos[gather]
    return ids[order], tfs[order], dls[order], new_pos


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
    with_positions: bool = False,
    fail_after_waves: int | None = None,  # test hook: simulate a mid-build kill
) -> IndexMeta:
    spark = docs.sparkSession
    os.makedirs(index_dir, exist_ok=True)

    tokens_path = os.path.join(index_dir, "tokens")
    doc_map_path = os.path.join(index_dir, "doc_map")
    segments_path = os.path.join(index_dir, "segments")
    terms_path = os.path.join(index_dir, "terms")

    # ---- Stage A: tokenize ONCE -> flat tf rows, partitioned by wave --------
    # No shuffle: the flat mapInPandas kernel emits final rows and each map
    # task writes its own per-wave files (n_waves files per task). Wave
    # pruning in Stage C replaces the old per-shard partition pruning.
    par = spark.sparkContext.defaultParallelism
    if n_shards is None:
        n_docs_hint = docs.count()
        n_shards = max(4, min(4096, int(n_docs_hint // 250_000) + 4))
    if not (resume and _done(tokens_path)):
        t0 = time.time()
        sel = [F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")]
        if url_col:
            sel.append(F.col(url_col).alias("url"))
        tf = docs.select(*sel).mapInPandas(
            _flat_tokens_fn("doc_id", "text", "url" if url_col else None,
                            n_shards, n_waves, with_positions=with_positions),
            schema=TOKENS_WAVE_SCHEMA,
        )
        tf.write.mode("overwrite").partitionBy("wave").parquet(tokens_path)
        _append_lineage(
            spark, index_dir,
            [("tokens", "-", "done", 0, 0, int((time.time() - t0) * 1000))],
        )

    # ---- Stage B: doc_map = the sentinel rows of the tokens checkpoint ------
    # Map-only: pushed-down term-IS-NULL filter + column pruning; no shuffle,
    # no second pass over the text (zero-token docs carry a sentinel too).
    if not (resume and _done(doc_map_path)):
        t0 = time.time()
        cols = ["doc_id", "doclen"] + (["url"] if url_col else [])
        dm = (
            spark.read.parquet(tokens_path)
            .filter(F.col("term").isNull())
            .select(*cols)
        )
        dm.write.mode("overwrite").parquet(doc_map_path)
        _append_lineage(
            spark, index_dir,
            [("doc_map", "-", "done", 0, 0, int((time.time() - t0) * 1000))],
        )
    # exact corpus stats: row count from parquet footers (free), then either a
    # driver-side pyarrow column read (doclen only, 8 bytes/doc — no Spark
    # job) below the guard, or one Spark agg above it. Both are exact; the
    # guard keeps driver memory bounded at 10^12 docs.
    import pyarrow.parquet as _pq

    n_docs = sum(
        _pq.ParquetFile(os.path.join(dp, fn)).metadata.num_rows
        for dp, _, fns in os.walk(doc_map_path)
        for fn in fns
        if fn.endswith(".parquet")
    )
    if n_docs <= DRIVER_STATS_MAX_ROWS:
        import pyarrow.compute as _pc
        import pyarrow.dataset as _ds

        _dl = _ds.dataset(doc_map_path).to_table(columns=["doclen"]).column("doclen")
        total_tokens = int(_pc.sum(_dl).as_py() or 0)
    else:
        row = (
            spark.read.parquet(doc_map_path)
            .agg(F.sum("doclen").alias("s"))
            .collect()[0]
        )
        total_tokens = int(row["s"] or 0)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    # ---- Stage C: two-phase posting build, per wave --------------------------
    done_units = _completed_units(spark, index_dir, "segments") if resume else set()
    waves = [list(range(w, n_shards, n_waves)) for w in range(n_waves)]
    tf_all = spark.read.parquet(tokens_path)
    for w, shard_list in enumerate(waves):
        unit = f"wave-{w}"
        if unit in done_units:
            continue
        if fail_after_waves is not None and w >= fail_after_waves:
            raise RuntimeError(f"injected failure before {unit}")
        # idempotent re-run: a crash between the wave's parquet commit and its
        # lineage row would otherwise double-append every (term, shard) row on
        # resume. Shards are wave-exclusive (s % n_waves == w), so deleting
        # this wave's shard dirs before (re)running restores exactly-once.
        import shutil as _shutil

        for s in shard_list:
            _shutil.rmtree(os.path.join(segments_path, f"shard={s}"), ignore_errors=True)
        t0 = time.time()
        # wave-dir partition pruning + pushed-down sentinel filter
        tf = tf_all.filter((F.col("wave") == w) & F.col("term").isNotNull())
        tf = tf.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        # two-phase build with ONE exchange: phase 1 packs split-local partial
        # runs map-side directly on the pruned scan (no repartition — no
        # reducer ever receives raw per-posting rows); phase 2 k-way merges
        # the partials per (shard, term) grouped by (shard, bucket) over an
        # explicit partition count (NOT coupled to spark.sql.shuffle
        # .partitions), then writes straight into shard= dirs (no write-side
        # repartition; each reduce task writes its shards' files directly).
        p2 = max(2 * par, 8)
        partial = tf.mapInPandas(
            _pack_partition_fn(with_positions=with_positions), schema=PARTIAL_SCHEMA
        )
        segs = partial.repartition(p2, "shard", "bucket").mapInPandas(
            _merge_partition_fn(avgdl, with_positions=with_positions),
            schema=SEGMENT_SCHEMA,
        )
        segs.write.mode("append").partitionBy("shard").parquet(segments_path)
        postings, nbytes = _wave_metrics(segments_path, shard_list)
        _append_lineage(
            spark, index_dir,
            [("segments", unit, "done", postings, nbytes,
              int((time.time() - t0) * 1000))],
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

    # row count from parquet footers only — no Spark job, no data read
    import pyarrow.parquet as _pq

    n_terms = sum(
        _pq.ParquetFile(os.path.join(dp, fn)).metadata.num_rows
        for dp, _, fns in os.walk(terms_path)
        for fn in fns
        if fn.endswith(".parquet")
    )
    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        total_tokens=total_tokens,
        n_terms=n_terms,
        n_shards=n_shards,
        n_buckets=n_buckets,
        n_salts=n_salts,
        extras={"with_positions": with_positions},
    )
    meta.save(index_dir)  # build-complete marker, written last
    return meta
