"""Boolean search-query grammar, mirroring the reference parser's semantics
(/root/reference/src/search/query_parser.py:16-210):

    <query> [ (+|-) <query> ]* (in | not in) <target> [ (and|or) ... ]

  * queries may be quoted ('...' or "...") and case is preserved inside
    quotes (analyzer casefolds later);
  * `@filename` marks a query file (reference `--queries-from`);
  * `+` / `-` compose sub-queries within one target — the reference applies
    them as embedding-vector ops with text_weight 2.0 / negative_weight 0.2
    (/root/reference/api/routes.py:759-850, config.py:13-14); our BM25 analog
    adds (+) the second query's scores or subtracts 0.2x (-) them;
  * `in` / `not in` bind a sub-query to a target (reference: audio / video /
    metadata; ours: named document fields/indexes, default 'text');
  * `and` = intersection with score sum (reference merge1,
    /root/reference/search.py:393-445); `or` = union-max (the reference
    parses OR but never executes it, query_parser.py:156-167 — we do).

The parse result mirrors the reference's dict shape so its golden parse-tree
tests translate directly (test_query_parser.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

SEARCH_TARGET_LINK = ["in", "not in"]
MERGE_OPS = ["and", "or"]
QUOTE_CHARS = "\"'"
VEC_OPS = "+-"
FILE_PREFIX = "@"
NEGATIVE_WEIGHT = 0.2  # reference config.py:14


class QueryParseError(ValueError):
    pass


@dataclass
class SubQuery:
    query_strs: list[str] = field(default_factory=list)
    query_types: list[str] = field(default_factory=list)  # 'text'|'file'|'phrase'
    vec_ops: list[str] = field(default_factory=list)      # '+' | '-' between parts
    target: str = ""
    link: str = ""                                        # 'in' | 'not in'
    implicit_target: bool = False                         # no 'in <target>' given


@dataclass
class ParsedQuery:
    cmd: str
    subqueries: list[SubQuery]
    merge_ops: list[str]


def _next_keyword(cmd: str, i: int, keywords: list[str]) -> str | None:
    low = cmd.lower()
    for k in sorted(keywords, key=len, reverse=True):  # 'not in' before 'in'
        if low.startswith(k, i) and (
            len(cmd) == i + len(k) or cmd[i + len(k)] in " "
        ):
            return k
    return None


def parse_query(cmd: str, targets: list[str] | None = None) -> ParsedQuery:
    targets = targets or ["text"]
    subs = [SubQuery()]
    merge_ops: list[str] = []
    i = 0
    need_query = True
    cmd = cmd.strip()
    while i < len(cmd):
        while i < len(cmd) and cmd[i] == " ":
            i += 1
        if i >= len(cmd):
            break
        if need_query:
            qtype = "text"
            if cmd[i] == FILE_PREFIX:
                qtype = "file"
                i += 1
            if i < len(cmd) and cmd[i] in QUOTE_CHARS:
                qc = cmd[i]
                end = cmd.find(qc, i + 1)
                if end == -1:
                    raise QueryParseError(f"unterminated quote at {i}")
                qs = cmd[i + 1 : end]
                i = end + 1
                # a quoted multi-word query is a PHRASE (FTS5 MATCH treats
                # quotes the same way; the reference passes them through,
                # src/index/sqlite_search_index.py:110-113)
                if qtype == "text" and " " in qs.strip():
                    qtype = "phrase"
            else:
                # unquoted: consume words until a vec-op / link keyword
                words = []
                while i < len(cmd):
                    nxt = cmd.find(" ", i)
                    word = cmd[i:] if nxt == -1 else cmd[i:nxt]
                    if word in ("+", "-") or _next_keyword(cmd, i, SEARCH_TARGET_LINK):
                        break
                    words.append(word)
                    i = len(cmd) if nxt == -1 else nxt + 1
                if not words:
                    raise QueryParseError(f"expected query text at {i}")
                qs = " ".join(words)
            subs[-1].query_strs.append(qs)
            subs[-1].query_types.append(qtype)
            need_query = False
            continue
        # vec op?
        if cmd[i] in VEC_OPS and (i + 1 >= len(cmd) or cmd[i + 1] == " "):
            subs[-1].vec_ops.append(cmd[i])
            i += 2
            need_query = True
            continue
        # link keyword
        link = _next_keyword(cmd, i, SEARCH_TARGET_LINK)
        if link is None:
            raise QueryParseError(f"expected IN or NOT IN at {i}: {cmd[i:]!r}")
        subs[-1].link = link
        i += len(link) + 1
        while i < len(cmd) and cmd[i] == " ":
            i += 1
        tgt = _next_keyword(cmd, i, targets)
        if tgt is None:
            raise QueryParseError(f"expected target {targets} at {i}: {cmd[i:]!r}")
        subs[-1].target = tgt
        i += len(tgt) + 1
        while i < len(cmd) and cmd[i] == " ":
            i += 1
        if i < len(cmd):
            op = _next_keyword(cmd, i, MERGE_OPS)
            if op is None:
                raise QueryParseError(f"expected AND/OR at {i}: {cmd[i:]!r}")
            merge_ops.append(op)
            i += len(op) + 1
            subs.append(SubQuery())
            need_query = True
    if not subs[-1].target:
        # bare query with no 'in <target>': default target, link 'in'.
        # implicit_target lets execute() fan the query out across ALL targets
        # (the reference unions audio+video+metadata when no target is named,
        # search.py:866-871)
        subs[-1].target = targets[0]
        subs[-1].link = subs[-1].link or "in"
        subs[-1].implicit_target = True
    for s in subs:
        if not s.query_strs:
            raise QueryParseError("empty sub-query")
        if len(s.vec_ops) != len(s.query_strs) - 1:
            # a trailing '+'/'-' with no following sub-query would otherwise
            # be silently dropped by execute()'s zip
            raise QueryParseError(f"dangling vector operator in {s.query_strs!r}")
    return ParsedQuery(cmd=cmd, subqueries=subs, merge_ops=merge_ops)


def execute(
    parsed: ParsedQuery,
    scorers: dict,
    mode: str = "any",
    phrase_scorers: dict | None = None,
):
    """Execute a parsed query. scorers: {target: (query, mode) -> DataFrame
    (doc_id, score)}. Returns the merged score relation (unranked); callers
    apply `ranked()`.

    phrase_scorers: optional {target: (phrase) -> DataFrame} for quoted
    multi-word queries (FtsIndex positional phrase scoring). Without one,
    a phrase degrades to a bag-of-terms conjunction with a warning-free
    fallback (documented: the pre-positions behavior).

    Execution order mirrors the reference: NOT-IN sub-queries run first and
    subtract from the positive results (/root/reference/search.py:79-113);
    `+`/`-` parts compose within a sub-query (add / subtract 0.2x scores);
    AND/OR merge left-to-right.
    """
    from pyspark.sql import functions as F

    from .search import and_merge, or_merge, subtract

    def score_one(s: SubQuery, idx: int, target: str | None = None):
        q = s.query_strs[idx]
        tgt = target or s.target
        if s.query_types[idx] == "file":
            # a '@file' part names a QUERY FILE, not query text — scoring it
            # literally would silently BM25-search the filename's tokens.
            # The CLI's --queries-from expands files into per-line queries
            # before parsing; execute() scores text/phrase parts only.
            raise QueryParseError(
                f"'@{q}' is a query-file reference — expand it into its "
                "queries before execute() (see CLI --queries-from)")
        if (
            s.query_types[idx] == "phrase"
            and phrase_scorers is not None
            and tgt in phrase_scorers
        ):
            return phrase_scorers[tgt](q)
        return scorers[tgt](q, "all" if s.query_types[idx] == "phrase" else mode)

    def run_sub_target(s: SubQuery, target: str):
        rel = score_one(s, 0, target)
        for j, op in enumerate(s.vec_ops):
            nxt = score_one(s, j + 1, target)
            if op == "+":
                rel = or_merge_sum(rel, nxt)
            else:
                rel = minus_weighted(rel, nxt)
        return rel

    def run_sub(s: SubQuery):
        # implicit target -> fan out across every registered target, merged
        # with union-max (reference unions all indexes, search.py:866-871)
        if s.implicit_target and len(scorers) > 1:
            rels = [run_sub_target(s, t) for t in sorted(scorers)]
            out = rels[0]
            for r in rels[1:]:
                out = or_merge(out, r)
            return out
        return run_sub_target(s, s.target)

    def or_merge_sum(a, b):
        return (
            a.select("doc_id", "score")
            .unionByName(b.select("doc_id", "score"))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )

    def minus_weighted(a, b):
        bb = b.select("doc_id", (F.col("score") * F.lit(NEGATIVE_WEIGHT)).alias("_neg"))
        return (
            a.join(bb, "doc_id", "left")
            .fillna(0.0, subset=["_neg"])
            .select("doc_id", (F.col("score") - F.col("_neg")).alias("score"))
        )

    positives = [s for s in parsed.subqueries if s.link == "in"]
    negatives = [s for s in parsed.subqueries if s.link == "not in"]
    neg_rels = [run_sub(s) for s in negatives]  # NOT-IN first (reference order)

    # merge positives left-to-right with the merge ops between *positive*
    # subqueries (reference applies ops pairwise in query order)
    pos_ops = []
    prev_was_pos = False
    for s, op in zip(parsed.subqueries, parsed.merge_ops + [None]):
        if s.link == "in":
            if prev_was_pos:
                pos_ops.append(pending_op)
            prev_was_pos = True
        pending_op = op
    rel = None
    for s in positives:
        r = run_sub(s)
        if rel is None:
            rel = r
        else:
            op = pos_ops.pop(0) if pos_ops else "and"
            rel = and_merge(rel, r) if op == "and" else or_merge(rel, r)
    if rel is None:
        raise QueryParseError("query has no positive (IN) sub-query")
    for nr in neg_rels:
        rel = subtract(rel, nr)
    return rel
