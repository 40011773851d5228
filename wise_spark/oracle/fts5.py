"""SQLite FTS5 bridge — the *actual reference engine* for rank-identity.

The reference's full-text path is an FTS5 virtual table queried with
`MATCH ... ORDER BY rank LIMIT k`
(/root/reference/src/index/sqlite_search_index.py:65-113).  Stdlib sqlite3
ships FTS5, so tests can compare our engine against the real thing on the
same corpus (ASCII corpora only: FTS5's unicode61 tokenizer ~ our analyzer
on ASCII; Unicode edge cases are covered by the pandas oracle instead).
"""

from __future__ import annotations

import sqlite3

import pandas as pd

from ..analyzer import tokenize_text


def fts5_available() -> bool:
    try:
        con = sqlite3.connect(":memory:")
        con.execute("CREATE VIRTUAL TABLE _probe USING fts5(x)")
        con.close()
        return True
    except sqlite3.OperationalError:
        return False


class Fts5Oracle:
    def __init__(self, docs: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        # in-memory, like the reference's backup-to-:memory: trick
        # (/root/reference/src/index/sqlite_search_index.py:91-102)
        self.con = sqlite3.connect(":memory:")
        self.con.execute(
            "CREATE VIRTUAL TABLE d USING fts5(body, tokenize='unicode61')"
        )
        with self.con:
            self.con.executemany(
                "INSERT INTO d(rowid, body) VALUES (?, ?)",
                zip(docs[id_col].astype(int), docs[text_col]),
            )

    @staticmethod
    def _match_expr(query: str, mode: str) -> str | None:
        terms = sorted(set(tokenize_text(query)))
        if not terms:
            return None
        quoted = [f'"{t}"' for t in terms]
        return (" OR " if mode == "any" else " ").join(quoted)

    def score_all(self, query: str, mode: str = "all") -> pd.DataFrame:
        """All matching docs as (doc_id, score) with score = -bm25 (positive
        = more relevant), sorted (score desc, doc_id asc)."""
        expr = self._match_expr(query, mode)
        if expr is None:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        rows = self.con.execute(
            "SELECT rowid, -bm25(d) FROM d WHERE d MATCH ?", (expr,)
        ).fetchall()
        out = pd.DataFrame(rows, columns=["doc_id", "score"]).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)

    def topk(self, query: str, k: int = 10, mode: str = "all") -> pd.DataFrame:
        return self.score_all(query, mode).head(k).reset_index(drop=True)

    def _match_topk(self, expr: str, k: int) -> pd.DataFrame:
        """Run one raw MATCH expression and shape the (doc_id, score)
        result — single owner of the execute/astype/sort/head contract for
        every raw-FTS5 query form (phrase/prefix/NEAR/initial)."""
        rows = self.con.execute(
            "SELECT rowid, -bm25(d) FROM d WHERE d MATCH ?", (expr,)
        ).fetchall()
        out = pd.DataFrame(rows, columns=["doc_id", "score"]).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        return (
            out.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    def phrase_topk(self, phrase: str, k: int = 10) -> pd.DataFrame:
        """Quoted-phrase MATCH (the reference passes quoted phrases straight
        into FTS5, src/index/sqlite_search_index.py:110-113)."""
        toks = tokenize_text(phrase)
        if not toks:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        expr = '"' + " ".join(toks) + '"'
        return self._match_topk(expr, k)

    def prefix_topk(self, prefix: str, k: int = 10) -> pd.DataFrame:
        """Prefix-token MATCH ('tok*') — the reference forwards raw FTS5
        syntax (src/index/sqlite_search_index.py:110-113), so prefix
        queries are part of its user-facing surface."""
        toks = tokenize_text(prefix.rstrip("*"))
        if len(toks) != 1:
            raise ValueError(f"prefix must normalize to one token: {prefix!r}")
        rows = self.con.execute(
            "SELECT rowid, -bm25(d) FROM d WHERE d MATCH ?", (f'"{toks[0]}" *',)
        ).fetchall()
        out = pd.DataFrame(rows, columns=["doc_id", "score"]).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        return (
            out.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    def near_topk(self, phrase_a: str, phrase_b: str, n: int = 10,
                  k: int = 10) -> pd.DataFrame:
        """NEAR("a" "b", N) MATCH — reachable through the reference's raw
        FTS5 surface like phrases and prefixes."""
        ta, tb = tokenize_text(phrase_a), tokenize_text(phrase_b)
        if not ta or not tb:
            raise ValueError("NEAR needs two non-empty phrases")
        expr = f'NEAR("{" ".join(ta)}" "{" ".join(tb)}", {int(n)})'
        return self._match_topk(expr, k)

    def initial_topk(self, phrase: str, k: int = 10) -> pd.DataFrame:
        """'^phrase' MATCH (initial-token anchor) — raw FTS5 surface."""
        toks = tokenize_text(phrase.lstrip("^"))
        if not toks:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        expr = '^"' + " ".join(toks) + '"'
        return self._match_topk(expr, k)
