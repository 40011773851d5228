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


def _vb_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte: (byte buffer, per-value END byte offsets).

    This is the single hottest loop of the whole index build (every posting
    passes through it 3x: gaps/tfs/doclens), so the pass count is bounded
    by the BATCH MAX, not the format max: a batch whose values all fit one
    byte (typical for tfs) costs exactly one astype; threshold compares and
    the byte-plane scatter loop run only up to bytes-needed(max).
    Byte-identical output to the reference 10-pass formulation."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    vmax = int(v.max())
    if vmax < 0x80:  # whole batch single-byte: no offsets math, no scatter
        return v.astype(np.uint8), np.arange(1, v.size + 1, dtype=np.int64)
    maxb = 1
    while maxb < 10 and vmax >= (1 << (7 * maxb)):
        maxb += 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESH[:maxb - 1]:
        nbytes += (v >= t)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # np.empty is safe: positions {starts[i]+j, j<nbytes[i]} tile the buffer
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    # byte plane 0 exists for EVERY value — write it unmasked
    out[starts] = (v & _U64(0x7F)).astype(np.uint8) | (
        (nbytes > 1).astype(np.uint8) << 7
    )
    # byte planes 1..maxb-1 over a SHRINKING candidate set: one full-array
    # compare total, then each plane only touches values that still have
    # bytes left (delta-gap batches are dominated by 1-2 byte values with a
    # handful of long absolutes, so full-array per-plane compares would
    # re-scan 19M values to find the last 15k)
    cand = np.flatnonzero(nbytes > 1)
    j = 1
    while cand.size:
        vv = v[cand]
        nb = nbytes[cand]
        out[starts[cand] + j] = ((vv >> _U64(7 * j)) & _U64(0x7F)).astype(
            np.uint8
        ) | ((nb - 1 > j).astype(np.uint8) << 7)
        j += 1
        cand = cand[nb > j]
    return out, ends


def vb_encode(values: np.ndarray) -> bytes:
    """MSB-continuation varbyte; vectorized (<= 10 passes, one per byte pos)."""
    out, _ = _vb_encode_arr(values)
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
    """Encode one sorted posting run (single-list wrapper of the vectorized
    many-list encoder, so bytes are identical by construction).

    Strictly-ascending contract mirrors the reference store's read-order
    guarantee (/root/reference/src/feature/store/test_feature_store.py:75-102);
    gap arithmetic is mod-2^64 so full-range int64 ids (e.g. xxhash64) work.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    assert n > 0
    out = encode_postings_many(
        doc_ids, tfs, doclens,
        np.array([0], dtype=np.int64), np.array([n], dtype=np.int64), avgdl,
    )
    return out[0]


def encode_positions_many(
    positions: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Varbyte-encode per-posting position lists for MANY posting lists.

    `positions` is the concatenation of every posting's ascending position
    list (len == sum(tfs)); tfs gives each posting's count; (starts, ends)
    delimit the POSTING ranges of each list. Within each posting the first
    position is absolute and the rest are deltas (same layout as docids).
    Returns one bytes object per list.
    """
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if positions.size == 0:
        return [b""] * max(0, len(starts))
    p_ends = np.cumsum(tfs)
    p_starts = p_ends - tfs  # every posting boundary restarts the delta chain
    u = positions.view(np.uint64)
    gaps = np.empty(positions.size, dtype=np.uint64)
    gaps[0] = u[0]
    with np.errstate(over="ignore"):
        gaps[1:] = u[1:] - u[:-1]
    gaps[p_starts] = u[p_starts]
    buf, off = _vb_encode_arr(gaps)
    raw = buf.tobytes()
    out = []
    for s, e in zip(starts, ends):
        if e - s == 0 or p_ends[e - 1] == p_starts[s]:
            out.append(b"")
            continue
        lo = int(p_starts[s])
        hi = int(p_ends[e - 1])
        b0 = int(off[lo - 1]) if lo > 0 else 0
        out.append(raw[b0:int(off[hi - 1])])
    return out


def decode_positions(buf: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions_many for ONE list -> flat int64 positions
    (len == sum(tfs)); slice per posting with cumsum(tfs)."""
    v = vb_decode(buf).view(np.int64)
    if v.size == 0:
        return v
    tfs = np.asarray(tfs, dtype=np.int64)
    p_starts = np.cumsum(tfs) - tfs
    cs = np.cumsum(v)
    base = cs[p_starts] - v[p_starts]
    return cs - np.repeat(base, tfs)


def decode_positions_subset(
    buf: bytes | np.ndarray, tfs: np.ndarray, keep: np.ndarray
) -> np.ndarray:
    """decode_positions restricted to postings where ``keep`` is True —
    flat int64 positions of length tfs[keep].sum(), bit-identical to
    decode_positions(buf, tfs) sliced to the kept postings.

    The full decode pays varbyte accumulation over EVERY position in the
    list; here only one cheap byte scan (terminator bits) touches the whole
    buffer, and the accumulation runs over the kept postings' bytes alone —
    so the phrase path's position decode is bounded by the candidate
    intersection instead of the head term's list size (a head term in a
    10^12-doc corpus carries ~10^11 positions; a selective phrase
    intersects to a handful)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    keep_idx = np.flatnonzero(keep)
    kt = tfs[keep_idx]
    n_out = int(kt.sum())
    if n_out == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    # value boundaries: one vectorized pass over the terminator bits
    term_idx = np.flatnonzero((b & 0x80) == 0)          # last byte per value
    starts = np.empty(term_idx.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    # value indices of the kept postings: arange within each posting run
    v_start = np.cumsum(tfs) - tfs
    off = np.arange(n_out, dtype=np.int64) - np.repeat(np.cumsum(kt) - kt, kt)
    val_idx = np.repeat(v_start[keep_idx], kt) + off
    s, e = starts[val_idx], term_idx[val_idx]
    lens = e - s + 1
    vals = np.zeros(n_out, dtype=np.uint64)
    for k in range(int(lens.max())):                    # <= 10 iterations
        m = lens > k
        vals[m] |= (b[s[m] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    v = vals.view(np.int64)
    # undo the per-posting delta encoding (same arithmetic as the full path)
    cs = np.cumsum(v)
    p0 = np.cumsum(kt) - kt
    base = cs[p0] - v[p0]
    return cs - np.repeat(base, kt)


def encode_postings_many(
    ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl: float,
    positions: np.ndarray | None = None,
) -> list[dict]:
    """Encode MANY posting lists in one vectorized pass.

    ids/tfs/dls are the concatenation of all lists; (starts, ends) delimit
    each list. This is the hot path of the index build: varbyte encoding,
    tf-components, and block maxima are computed across every list at once
    (numpy reduceat), then sliced per list — no per-list Python arithmetic.
    With `positions` (flat, aligned to postings via tfs) each output dict
    also carries a varbyte 'positions' payload.
    """
    from ..query.bm25 import tf_component

    ids = np.ascontiguousarray(ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n_total = ids.size
    if n_total == 0:
        return []
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    # ascending-within-list contract
    is_start = np.zeros(n_total, dtype=bool)
    is_start[starts] = True
    if n_total > 1:
        bad = ~(ids[1:] > ids[:-1]) & ~is_start[1:]
        if bad.any():
            raise ValueError("doc_ids must be strictly ascending and unique")
    # gaps mod 2^64; list-leading values stored absolute
    u = ids.view(np.uint64)
    gaps = np.empty(n_total, dtype=np.uint64)
    gaps[0] = u[0]
    with np.errstate(over="ignore"):
        gaps[1:] = u[1:] - u[:-1]
    gaps[starts] = u[starts]
    buf_g, off_g = _vb_encode_arr(gaps)
    buf_t, off_t = _vb_encode_arr((tfs - 1).astype(np.uint64))
    buf_d, off_d = _vb_encode_arr(dls.astype(np.uint64))
    tfc = tf_component(tfs, dls, avgdl)
    # per-list whole aggregates
    max_tfc = np.maximum.reduceat(tfc, starts)
    sum_tf = np.add.reduceat(tfs, starts)
    # block starts across every list: start_i + BLOCK*j
    lens = ends - starts
    nblk = (lens + BLOCK - 1) // BLOCK
    rep_starts = np.repeat(starts, nblk)
    # vectorized within-list block indices (0..nblk_i-1 per list): a per-list
    # [np.arange(k) for k in nblk] loop allocated one tiny array per posting
    # list — interpreter overhead linear in list count in the build's
    # hottest kernel (merge tasks carry millions of short lists)
    if nblk.size:
        nb_bounds = np.cumsum(nblk)
        within = (np.arange(int(nb_bounds[-1]), dtype=np.int64)
                  - np.repeat(nb_bounds - nblk, nblk))
    else:
        within = np.empty(0, np.int64)
    blockstarts = rep_starts + within * BLOCK
    blk_max_all = np.maximum.reduceat(tfc, blockstarts) if blockstarts.size else np.empty(0)
    blk_end_idx = np.minimum(blockstarts + BLOCK, np.repeat(ends, nblk)) - 1
    blk_last_all = ids[blk_end_idx]
    blk_bounds = np.r_[0, np.cumsum(nblk)]
    # byte ranges per list (end offsets of the value BEFORE each list start)
    def byte_range(off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        bstart = np.where(starts > 0, off[starts - 1], 0)
        bend = off[ends - 1]
        return bstart, bend
    gs, ge = byte_range(off_g)
    ts_, te = byte_range(off_t)
    ds_, de = byte_range(off_d)
    gbytes, tbytes, dbytes = buf_g.tobytes(), buf_t.tobytes(), buf_d.tobytes()
    pos_bufs = (
        encode_positions_many(positions, tfs, starts, ends)
        if positions is not None
        else None
    )
    out = []
    for i in range(starts.size):
        out.append(
            {
                "n": int(lens[i]),
                "docids": gbytes[gs[i]:ge[i]],
                "tfs": tbytes[ts_[i]:te[i]],
                "doclens": dbytes[ds_[i]:de[i]],
                "positions": pos_bufs[i] if pos_bufs is not None else None,
                "blk_last": blk_last_all[blk_bounds[i]:blk_bounds[i + 1]].tolist(),
                "blk_max": blk_max_all[blk_bounds[i]:blk_bounds[i + 1]].tolist(),
                "max_tfc": float(max_tfc[i]),
                "sum_tf": int(sum_tf[i]),
            }
        )
    return out


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment row (mapping/pd.Series) -> (doc_ids, tfs, doclens)."""
    gaps = vb_decode(bytes(row["docids"]))
    with np.errstate(over="ignore"):
        doc_ids = np.cumsum(gaps, dtype=np.uint64).view(np.int64)
    tfs = vb_decode(bytes(row["tfs"])).astype(np.int64) + 1
    doclens = vb_decode(bytes(row["doclens"])).astype(np.int64)
    return doc_ids, tfs, doclens
