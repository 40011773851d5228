"""Codec round-trip + ordering guarantees.

Mirror of the reference's feature-store round-trip and read-order tests
(/root/reference/src/feature/store/test_feature_store.py:15-102).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wise_spark.index.codec import (
    BLOCK,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)
from wise_spark.query.bm25 import tf_component


def test_vb_roundtrip_basic():
    for arr in [
        [],
        [0],
        [127],
        [128],
        [1, 2, 3],
        [0, 2**7, 2**14, 2**21, 2**28, 2**35, 2**42, 2**49, 2**56, 2**63],
        [2**64 - 1],
    ]:
        a = np.array(arr, dtype=np.uint64)
        assert (vb_decode(vb_encode(a)) == a).all(), arr


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_vb_roundtrip_hypothesis(vals):
    a = np.array(vals, dtype=np.uint64)
    out = vb_decode(vb_encode(a))
    assert out.dtype == np.uint64
    assert (out == a).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=500),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    ),
    st.floats(min_value=1.0, max_value=500.0),
)
def test_postings_roundtrip(entries, avgdl):
    entries.sort()
    ids = np.array([e[0] for e in entries], dtype=np.int64)
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl)
    out_ids, out_tfs, out_dls = decode_postings(enc)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()
    assert (out_dls == dls).all()
    # ascending read-order guarantee
    assert (np.diff(out_ids) > 0).all() if len(ids) > 1 else True
    # block-max metadata is an EXACT upper bound and tight per block
    tfc = tf_component(tfs, dls, avgdl)
    n_blocks = (len(ids) + BLOCK - 1) // BLOCK
    assert len(enc["blk_last"]) == n_blocks == len(enc["blk_max"])
    for b in range(n_blocks):
        seg = tfc[b * BLOCK : (b + 1) * BLOCK]
        assert enc["blk_max"][b] == seg.max()
        assert enc["blk_last"][b] == ids[min((b + 1) * BLOCK - 1, len(ids) - 1)]
    assert enc["max_tfc"] == tfc.max()


def test_postings_full_range_int64_ids():
    """xxhash64-style ids span the full int64 range; gap arithmetic must be
    overflow-safe (mod-2^64) including the negative->positive crossing."""
    ids = np.array([-(2**63), -5, -1, 0, 3, 2**63 - 1], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    dls = np.array([10, 10, 10, 10, 10, 10], dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl=10.0)
    out_ids, out_tfs, _ = decode_postings(enc)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()


def test_postings_reject_unsorted_or_dup():
    avgdl = 10.0
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2]), np.array([1, 1]), np.array([5, 5]), avgdl)
    with pytest.raises(ValueError):
        encode_postings(np.array([2, 2]), np.array([1, 1]), np.array([5, 5]), avgdl)


def test_decode_positions_subset_matches_full():
    """Candidate-bounded decode must be bit-identical to the full decode
    sliced to the kept postings, across random tf/position shapes."""
    import numpy as np

    from wise_spark.index.codec import (
        decode_positions,
        decode_positions_subset,
        encode_positions_many,
    )

    rng = np.random.default_rng(11)
    for trial in range(20):
        n_post = int(rng.integers(1, 60))
        tfs = rng.integers(1, 7, size=n_post).astype(np.int64)
        pos = np.concatenate([
            np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs
        ]).astype(np.int64)
        buf = encode_positions_many(
            pos, tfs, np.array([0], dtype=np.int64),
            np.array([n_post], dtype=np.int64),
        )[0]
        full = decode_positions(buf, tfs)
        keep = rng.random(n_post) < rng.random()
        sel = decode_positions_subset(buf, tfs, keep)
        # expected: the full flat array sliced to kept postings
        p_ends = np.cumsum(tfs)
        want = np.concatenate(
            [full[e - t: e] for e, t, k in zip(p_ends, tfs, keep) if k]
            or [np.empty(0, dtype=np.int64)]
        )
        assert np.array_equal(sel, want), trial
    # all-False and all-True edges
    assert decode_positions_subset(buf, tfs, np.zeros(n_post, bool)).size == 0
    assert np.array_equal(
        decode_positions_subset(buf, tfs, np.ones(n_post, bool)), full
    )
