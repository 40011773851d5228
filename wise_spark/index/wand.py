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
  * WAND prunes a candidate iff upper_bound <= threshold WITH A FULL HEAP —
    safe under ties because docs are visited in ascending doc_id order, so
    any heap entry with an equal score has a smaller doc_id and wins the
    tie-break anyway;
  * block maxima are exact float maxima of the true tf-component (no
    quantization), so upper bounds are true upper bounds.
"""

from __future__ import annotations

import heapq

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
    lists = _decode_terms(pdf, idfs, avgdl)
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
            out = score_shard_taat(pdf, idfs, avgdl, n_terms, mode)
        else:
            out = _bmw_any(lists, k)
    # local top-k with the global tie-break order
    out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def _bmw_any(lists: list[dict], k: int) -> pd.DataFrame:
    """Classic WAND pivoting with block-max refinement, exact top-k."""
    q = len(lists)
    ptr = [0] * q
    sizes = [x["ids"].size for x in lists]
    # heap of (score, -doc_id) so the root is the worst kept candidate
    heap: list[tuple[float, int]] = []
    threshold = -np.inf

    def push(doc: int, score: float) -> None:
        nonlocal threshold
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                threshold = heap[0][0]
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
            threshold = heap[0][0]

    order = list(range(q))
    while True:
        live = [i for i in order if ptr[i] < sizes[i]]
        if not live:
            break
        live.sort(key=lambda i: lists[i]["ids"][ptr[i]])
        # pivot: first prefix whose UB sum can beat the threshold
        ub = 0.0
        pivot_idx = -1
        for j, i in enumerate(live):
            ub += lists[i]["ub"]
            if len(heap) < k or ub > threshold:
                pivot_idx = j
                break
        if pivot_idx < 0:
            break  # even the full UB sum cannot beat the threshold
        pivot_doc = int(lists[live[pivot_idx]]["ids"][ptr[live[pivot_idx]]])
        # block-max refinement at the pivot
        bub = 0.0
        for i in live:
            x = lists[i]
            p = ptr[i]
            if x["ids"][p] > pivot_doc:
                break
            # block containing pivot_doc; lists exhausted before pivot add 0
            blk = int(np.searchsorted(x["blk_last"], pivot_doc, side="left"))
            if blk < x["blk_max"].size:
                bub += float(x["blk_max"][blk])
        if len(heap) == k and bub <= threshold:
            # skip: advance the lagging lists past this pivot's block boundary
            nxt = pivot_doc + 1
            for i in live:
                x = lists[i]
                if x["ids"][ptr[i]] <= pivot_doc:
                    ptr[i] = int(np.searchsorted(x["ids"], nxt, side="left"))
            continue
        # check whether all lists before pivot are aligned on pivot_doc
        aligned = all(
            lists[i]["ids"][ptr[i]] == pivot_doc for i in live[: pivot_idx + 1]
        )
        if aligned:
            score = 0.0
            for i in sorted(live, key=lambda i: lists[i]["term"]):  # sorted-term fold
                x = lists[i]
                p = ptr[i]
                if p < sizes[i] and x["ids"][p] == pivot_doc:
                    score += float(x["contrib"][p])
            for i in live:
                if ptr[i] < sizes[i] and lists[i]["ids"][ptr[i]] == pivot_doc:
                    ptr[i] += 1
            push(pivot_doc, score)
        else:
            # advance the earliest list up to the pivot
            i = live[0]
            ptr[i] = int(np.searchsorted(lists[i]["ids"], pivot_doc, side="left"))
    if not heap:
        return pd.DataFrame({"doc_id": [], "score": []})
    docs = np.array([-d for _, d in heap], dtype=np.int64)
    scores = np.array([s for s, _ in heap], dtype=np.float64)
    return pd.DataFrame({"doc_id": docs, "score": scores})
