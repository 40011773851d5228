"""Pure-pandas exact BM25 oracle — the in-repo reference engine.

The reference validates its fast (IVF) index against an exhaustive exact
index (/root/reference/docs/Search-Index-Evaluation.md:79-86); this class
plays the exhaustive role for our WAND scorer: every Spark path must be
rank-identical (top-k docIDs; scores to 1e-9) to this oracle, which in turn
is validated against real SQLite FTS5 (oracle/fts5.py).

Deterministic float contract: per-document score sums term contributions in
sorted-term order, float64; tie-break ascending doc_id.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from ..analyzer import tokenize_text
from ..query.bm25 import idf_scalar, tf_component  # idf_scalar applies the floor


class PandasBM25Oracle:
    def __init__(self, docs: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self.doc_ids = docs[id_col].to_numpy()
        self.tokens = [tokenize_text(t) for t in docs[text_col]]
        self.doclens = np.array([len(t) for t in self.tokens], dtype=np.int64)
        self.n_docs = len(self.tokens)
        self.avgdl = float(self.doclens.mean()) if self.n_docs else 0.0
        self.tfs = [Counter(t) for t in self.tokens]
        self.df: Counter[str] = Counter()
        for c in self.tfs:
            self.df.update(c.keys())

    def score_all(self, query: str, mode: str = "all") -> pd.DataFrame:
        """Score every matching document. mode='all' (FTS5 MATCH conjunctive)
        or 'any' (disjunctive). Returns (doc_id, score) sorted by
        (score desc, doc_id asc)."""
        terms = sorted(set(tokenize_text(query)))
        if not terms:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": np.int64, "score": np.float64}
            )
        idfs = {t: idf_scalar(self.df.get(t, 0), self.n_docs) for t in terms}
        rows = []
        for i in range(self.n_docs):
            c = self.tfs[i]
            hit = [t for t in terms if c.get(t, 0) > 0]
            if mode == "all" and len(hit) != len(terms):
                continue
            if not hit:
                continue
            s = 0.0
            for t in terms:  # sorted-term order, float64
                tf = c.get(t, 0)
                if tf:
                    s += idfs[t] * float(tf_component(tf, self.doclens[i], self.avgdl))
            rows.append((int(self.doc_ids[i]), s))
        out = pd.DataFrame(rows, columns=["doc_id", "score"]).astype(
            {"doc_id": np.int64, "score": np.float64}
        )
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)

    def topk(self, query: str, k: int = 10, mode: str = "all") -> pd.DataFrame:
        return self.score_all(query, mode).head(k).reset_index(drop=True)
