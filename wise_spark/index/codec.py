"""Posting-list codec: delta-gap + variable-byte + block-max metadata.

The index analog of the reference's bounded binary feature shards
(/root/reference/src/feature/store/webdataset_store.py:34-45,
numpy_save_store.py:57-87): sorted docID runs, compact bytes, and enough
metadata to skip (block-max) without decoding.

Format per posting list (one term within one doc-shard):
  docids   : varbyte(delta gaps), first value absolute; strictly ascending
  tfs      : varbyte(tf - 1)
  doclens  : varbyte(doclen)
  blk_last : int64[ceil(n/BLOCK)]  last docID per block (search skip keys)
  blk_max  : float64[...]          max tf-component per block, EXACT float
             (no quantization — SURVEY.md section 7 hard-part 4: a lossy upper
             bound could prune a true top-k doc; exact max keeps WAND
             rank-identical)

Everything is vectorized numpy — encode/decode never loops per posting.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128

_U64 = np.uint64
_THRESH = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def vb_encode(values: np.ndarray) -> bytes:
    """MSB-continuation varbyte; vectorized (<= 10 passes, one per byte pos)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESH:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        idx = starts[mask] + j
        chunk = (v[mask] >> _U64(7 * j)).astype(np.uint64) & _U64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def vb_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Inverse of vb_encode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    n_groups = int(group[-1]) + 1
    starts = np.zeros(n_groups, dtype=np.int64)
    # start of each group = index after previous terminator
    term_idx = np.flatnonzero(is_last)
    starts[1:] = term_idx[:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    payload = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    out = np.zeros(n_groups, dtype=np.uint64)
    np.add.at(out, group, payload)
    return out


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray, avgdl: float
) -> dict:
    """Encode one sorted posting run; returns the segment-row payload dict."""
    from ..query.bm25 import tf_component

    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    assert n > 0
    # strictly ascending contract (mirrors the reference store's read-order
    # guarantee, /root/reference/src/feature/store/test_feature_store.py:75-102).
    # Element-wise comparison, NOT np.diff — diffs of full-range int64 ids
    # (e.g. xxhash64 doc ids) overflow.
    if n > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("doc_ids must be strictly ascending and unique")
    # gaps in mod-2^64 arithmetic: correct for any int64 ids; decode cumsums
    # in uint64 and reinterprets as int64
    u = doc_ids.view(np.uint64) if doc_ids.flags.c_contiguous else doc_ids.astype(np.int64).view(np.uint64)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = u[0]
    if n > 1:
        with np.errstate(over="ignore"):
            gaps[1:] = u[1:] - u[:-1]
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    doclens = np.ascontiguousarray(doclens, dtype=np.int64)
    tfc = tf_component(tfs, doclens, avgdl)
    n_blocks = (n + BLOCK - 1) // BLOCK
    blk_last = doc_ids[np.minimum(np.arange(1, n_blocks + 1) * BLOCK - 1, n - 1)]
    blk_max = np.array(
        [tfc[i * BLOCK : (i + 1) * BLOCK].max() for i in range(n_blocks)],
        dtype=np.float64,
    )
    return {
        "n": int(n),
        "docids": vb_encode(gaps),
        "tfs": vb_encode((tfs - 1).astype(np.uint64)),
        "doclens": vb_encode(doclens.astype(np.uint64)),
        "blk_last": blk_last.tolist(),
        "blk_max": blk_max.tolist(),
        "max_tfc": float(tfc.max()),
        "sum_tf": int(tfs.sum()),
    }


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment row (mapping/pd.Series) -> (doc_ids, tfs, doclens)."""
    gaps = vb_decode(bytes(row["docids"]))
    with np.errstate(over="ignore"):
        doc_ids = np.cumsum(gaps, dtype=np.uint64).view(np.int64)
    tfs = vb_decode(bytes(row["tfs"])).astype(np.int64) + 1
    doclens = vb_decode(bytes(row["doclens"])).astype(np.int64)
    return doc_ids, tfs, doclens
