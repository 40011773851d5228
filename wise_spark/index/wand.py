"""Per-shard scoring kernels: exact TAAT and block-max WAND top-k.

Documents are sharded by doc_id, so one shard holds ALL postings of a doc
for every query term — each shard computes complete, final scores locally
and emits a local top-k; the global merge is a tiny TakeOrdered (the same
local-heaps -> global-merge shape as the reference's per-index faiss top-k
followed by result merging, /root/reference/search.py:121-159).

Exactness contract (everything rank-identical to the naive scorer/oracles):
  * scores are float64; per-doc contributions are summed in sorted-term
    order (TAAT iterates terms sorted; WAND accumulates at the pivot doc in
    sorted-term order because the term list itself is processed in a
    deterministic sequence and float addition over the same operand order is
    deterministic);
  * ties break ascending doc_id;
  * pruning drops only doc-id intervals whose summed block upper bounds fall
    BELOW a true lower bound of the k-th best score, then keeps ALL score
    ties at the k-th boundary — so the surviving set is a superset of the
    exact top-k and the final sort resolves ties exactly;
  * block maxima are exact float maxima of the true tf-component (no
    quantization), so upper bounds are true upper bounds.
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from ..query.bm25 import tf_component
from .codec import BLOCK, decode_postings

# when a query's total decoded postings in a shard are below this, vectorized
# TAAT beats the Python WAND loop; both are exact so this is purely a
# performance switch (the analog of the reference choosing Flat vs IVF,
# /root/reference/create-index.py:30-35 — except ours never changes results)
TAAT_CUTOFF = 50_000


def _decode_terms(pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float):
    """Decode one shard's rows for the query terms, sorted by term."""
    lists = []
    for _, row in pdf.sort_values("term").iterrows():
        ids, tfs, dls = decode_postings(row)
        contrib = idfs[row["term"]] * tf_component(tfs, dls, avgdl)
        lists.append(
            {
                "term": row["term"],
                "ids": ids,
                "contrib": contrib,
                "blk_last": np.asarray(row["blk_last"], dtype=np.int64),
                "blk_max": np.asarray(row["blk_max"], dtype=np.float64) * idfs[row["term"]],
                "ub": float(idfs[row["term"]] * row["max_tfc"]),
            }
        )
    return lists


def score_shard_taat(
    pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float, n_terms: int, mode: str
) -> pd.DataFrame:
    """Exact exhaustive scoring of one shard (vectorized)."""
    return _taat_over_lists(_decode_terms(pdf, idfs, avgdl), n_terms, mode)


def _taat_over_lists(lists: list[dict], n_terms: int, mode: str) -> pd.DataFrame:
    """Exact TAAT over already-decoded term lists (shared by the exhaustive
    path and the WAND small-shard cutoff, which would otherwise varbyte-
    decode every posting list a second time)."""
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    all_ids = np.concatenate([x["ids"] for x in lists])
    all_contrib = np.concatenate([x["contrib"] for x in lists])
    # deterministic accumulation: stable sort by (doc, term order preserved)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, all_contrib)
    hits = np.bincount(inv, minlength=uniq.size)
    if mode == "all":
        keep = hits == n_terms
        uniq, scores = uniq[keep], scores[keep]
    return pd.DataFrame({"doc_id": uniq.astype(np.int64), "score": scores})


def score_shard_wand(
    pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float, n_terms: int,
    mode: str, k: int,
) -> pd.DataFrame:
    """Block-max WAND local top-k for one shard ('any' semantics).

    For 'all' (conjunctive, FTS5 MATCH default) the driver loop intersects
    from the rarest list using galloping searchsorted — exact and faster
    than WAND for conjunctions.
    """
    lists = _decode_terms(pdf, idfs, avgdl)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    if mode == "all":
        if len(lists) < n_terms:
            return pd.DataFrame({"doc_id": [], "score": []})
        lists.sort(key=lambda x: x["ids"].size)
        ids = lists[0]["ids"]
        for x in lists[1:]:
            pos = np.searchsorted(x["ids"], ids)
            pos = np.minimum(pos, x["ids"].size - 1)
            ids = ids[x["ids"][pos] == ids]
            if ids.size == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
        score = np.zeros(ids.size, dtype=np.float64)
        for x in sorted(lists, key=lambda x: x["term"]):  # sorted-term fold
            pos = np.searchsorted(x["ids"], ids)
            score += x["contrib"][pos]
        out = pd.DataFrame({"doc_id": ids.astype(np.int64), "score": score})
    else:
        total = sum(x["ids"].size for x in lists)
        if total <= TAAT_CUTOFF or len(lists) == 1:
            out = _taat_over_lists(lists, n_terms, mode)
        else:
            out = _bmw_any(lists, k)
    # local top-k with the global tie-break order
    out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def _theta0(all_ids: np.ndarray, all_contrib: np.ndarray, k: int) -> float:
    """Lower bound on the k-th best TOTAL score: the k-th largest per-doc
    single-term contribution (a doc's total score >= any one contribution).
    Found from the top-T postings by contribution — argpartition, no sort of
    the full arrays; T grows (rarely) until k distinct docs are covered."""
    n = all_ids.size
    t = min(n, max(4 * k, 256))
    while True:
        top = np.argpartition(all_contrib, n - t)[n - t:]
        uniq, inv = np.unique(all_ids[top], return_inverse=True)
        if uniq.size >= k or t == n:
            per_doc = np.full(uniq.size, -np.inf)
            np.maximum.at(per_doc, inv, all_contrib[top])
            if uniq.size < k:
                return -np.inf  # fewer than k matching docs: no pruning
            return float(np.partition(per_doc, uniq.size - k)[uniq.size - k])
        t = min(n, t * 4)


def _bmw_any(lists: list[dict], k: int) -> pd.DataFrame:
    """Block-max pruned TAAT, exact top-k, fully vectorized (no per-posting
    Python loop — the classic WAND pointer walk is O(postings) interpreted
    Python on head terms, the very anti-pattern the hot path bans).

    1. theta0: a true lower bound on the k-th best score (see _theta0).
    2. The doc-id axis is cut at every block boundary of every list; each
       interval's upper bound = sum over lists of the covering block's
       blk_max * idf (searchsorted per list — vectorized).
    3. Intervals with UB < theta0 cannot contain a top-k doc (every doc's
       score <= its interval UB; every top-k doc's score >= theta0) and are
       dropped with their postings; the survivors get one exact TAAT pass.
    Pruning power equals WAND's static block-max phase; exactness never
    depends on it (TAAT over a superset of the true top-k)."""
    all_ids = np.concatenate([x["ids"] for x in lists])
    all_contrib = np.concatenate([x["contrib"] for x in lists])
    theta0 = _theta0(all_ids, all_contrib, k)
    # interval ends = union of block boundaries (ascending doc ids)
    bounds = np.unique(np.concatenate([x["blk_last"] for x in lists]))
    iv_ub = np.zeros(bounds.size, dtype=np.float64)
    for x in lists:
        idx = np.searchsorted(x["blk_last"], bounds, side="left")
        ok = idx < x["blk_max"].size
        iv_ub[ok] += x["blk_max"][idx[ok]]
    live = iv_ub >= theta0
    # gather surviving postings (a doc's postings all map to one interval)
    iv = np.searchsorted(bounds, all_ids, side="left")
    keep = live[iv]
    ids = all_ids[keep]
    if ids.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    uniq, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, all_contrib[keep])
    # local top-k among survivors: threshold at the k-th largest score, keep
    # ALL ties at the boundary, then resolve (score desc, doc_id asc)
    if uniq.size > k:
        kth = np.partition(scores, uniq.size - k)[uniq.size - k]
        cand = scores >= kth
        uniq, scores = uniq[cand], scores[cand]
    order = np.lexsort((uniq, -scores))[:k]
    return pd.DataFrame(
        {"doc_id": uniq[order].astype(np.int64), "score": scores[order]}
    )
