"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md section 1).

Shape mandated by BASELINE.json.input_hint:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Every value is a pure function of (seed, doc_id) via counter-based hashing
(splitmix64), so generation is identical no matter how Spark partitions the
id range — this is what makes resume/scaling tests and the two-parallelism
benchmark read *identical* input.  Zipf-distributed vocabulary (s ~= 1.1)
produces genuine head-term posting skew; a deterministic subset of documents
share identical token multisets to exercise score ties + docID tie-breaking.

The `text` column is constructed independently of `html` wrapping, and the
`html` column embeds boilerplate (<nav>, <script>) drawn from a *different*
vocabulary slice — so `extract_text(html) == text` holds iff the extractor
actually drops boilerplate (the byte-identity invariant test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CORPUS_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"
)

DEFAULT_SEED = 42
DEFAULT_VOCAB = 50_000
ZIPF_S = 1.1
_MIN_TOKENS, _MAX_TOKENS = 20, 200
_TIE_PERIOD = 101  # doc_id % 101 == 100  ->  same token multiset as doc_id-1

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]
# Fixed "stopword" head of the vocabulary (ranks 0..9 are the most frequent).
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
# Unicode/casefold fixtures pinned at known mid ranks.
_SPECIAL = {200: "müller", 500: "straße", 900: "café"}

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 arrays (public-domain construction)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


def _h(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    base = np.uint64((seed * 0x1000003) ^ (stream * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        return _splitmix64(idx.astype(np.uint64) + base * np.uint64(0x9E3779B97F4A7C15))


def _uniform(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    return (_h(seed, stream, idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _word(i: int) -> str:
    if i < len(_STOPWORDS):
        return _STOPWORDS[i]
    if i in _SPECIAL:
        return _SPECIAL[i]
    # base-20 syllable spelling of the rank; 3+ syllables so no stopword clash
    out, x = [], i
    for _ in range(3):
        out.append(_SYLLABLES[x % 20])
        x //= 20
    while x:
        out.append(_SYLLABLES[x % 20])
        x //= 20
    return "".join(out)


class _Vocab:
    def __init__(self, size: int):
        self.size = size
        self.words = [_word(i) for i in range(size)]
        ranks = np.arange(1, size + 1, dtype=np.float64)
        w = ranks ** (-ZIPF_S)
        self.cdf = np.cumsum(w / w.sum())


_VOCAB_CACHE: dict[int, _Vocab] = {}


def vocab(size: int = DEFAULT_VOCAB) -> _Vocab:
    if size not in _VOCAB_CACHE:
        _VOCAB_CACHE[size] = _Vocab(size)
    return _VOCAB_CACHE[size]


def _doc_token_ids(doc_id: int, seed: int, v: _Vocab) -> np.ndarray:
    """Token id sequence for one document (pure function of seed+doc_id)."""
    if doc_id % _TIE_PERIOD == _TIE_PERIOD - 1 and doc_id > 0:
        ids = _doc_token_ids(doc_id - 1, seed, v)
        return np.sort(ids)  # same multiset, different order -> score tie
    d = np.uint64(doc_id)
    n = int(_MIN_TOKENS + (_h(seed, 1, np.array([d]))[0] % np.uint64(_MAX_TOKENS - _MIN_TOKENS)))
    pos = (np.uint64(doc_id) << np.uint64(20)) + np.arange(n, dtype=np.uint64)
    u = _uniform(seed, 2, pos)
    # float rounding can leave cdf[-1] a few ulp below 1.0 (measured at
    # vocab 1000/5000), and u can exceed it — clamp so searchsorted never
    # returns vocab_size (a latent IndexError on v.words)
    ids = np.searchsorted(v.cdf, u, side="left")
    return np.minimum(ids, len(v.cdf) - 1).astype(np.int64)


def doc_tokens(doc_id: int, seed: int = DEFAULT_SEED, vocab_size: int = DEFAULT_VOCAB) -> list[str]:
    v = vocab(vocab_size)
    return [v.words[i] for i in _doc_token_ids(doc_id, seed, v)]


def _title_tokens(doc_id: int, seed: int, v: _Vocab) -> list[str]:
    pos = (np.uint64(doc_id) << np.uint64(20)) + np.uint64(1 << 19) + np.arange(4, dtype=np.uint64)
    u = _uniform(seed, 3, pos)
    # same clamp as _doc_token_ids: cdf[-1] sits a few ulp below 1.0, so an
    # unclamped searchsorted can return vocab_size (IndexError)
    ids = np.minimum(np.searchsorted(v.cdf, u, side="left"), len(v.cdf) - 1)
    return [v.words[i] for i in ids]


def _boiler_tokens(doc_id: int, seed: int, v: _Vocab) -> list[str]:
    # drawn from a different stream; these must NOT appear in extracted text
    pos = (np.uint64(doc_id) << np.uint64(20)) + np.uint64(3 << 18) + np.arange(6, dtype=np.uint64)
    u = _uniform(seed, 4, pos)
    ids = np.minimum(np.searchsorted(v.cdf, u, side="left"), len(v.cdf) - 1)
    return [v.words[i] for i in ids]


def doc_text(doc_id: int, seed: int = DEFAULT_SEED, vocab_size: int = DEFAULT_VOCAB) -> str:
    """Canonical extracted text: title block + paragraph blocks joined by \\n."""
    v = vocab(vocab_size)
    toks = doc_tokens(doc_id, seed, vocab_size)
    title = " ".join(_title_tokens(doc_id, seed, v))
    n_paras = 1 + int(_h(seed, 5, np.array([np.uint64(doc_id)]))[0] % np.uint64(8))
    paras = [" ".join(p) for p in np.array_split(np.array(toks, dtype=object), n_paras) if len(p)]
    return "\n".join([title] + paras)


def _doc_html(doc_id: int, text: str, seed: int, v: _Vocab) -> bytes:
    lines = text.split("\n")
    title, paras = lines[0], lines[1:]
    boiler = " ".join(_boiler_tokens(doc_id, seed, v))
    parts = [
        "<html><head><title>", title, "</title>",
        "<script>var x = '", boiler, "';</script></head><body>",
        "<nav> ", boiler, " </nav>",
    ]
    for p in paras:
        parts.append("<p>  ")
        parts.append(p)
        parts.append("  </p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


_LANGS = ["en"] * 9 + ["de", "fr", "zz"]  # ~75% en; zz = quarantine-lang fixture


def corpus_pandas(
    doc_ids: np.ndarray,
    seed: int = DEFAULT_SEED,
    vocab_size: int = DEFAULT_VOCAB,
    invalid_every: int = 0,
    dup_url_every: int = 0,
) -> pd.DataFrame:
    """Materialize corpus rows for the given doc_ids (any order/subset)."""
    v = vocab(vocab_size)
    ids = np.asarray(doc_ids, dtype=np.int64)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2024-01-01T00:00:00")
    lang_pick = _h(seed, 6, ids.astype(np.uint64)) % np.uint64(12)
    for j, d in enumerate(ids):
        d = int(d)
        site = d % 97
        url = f"https://example{site}.test/p/{d:08d}"
        if dup_url_every and d % dup_url_every == dup_url_every - 1 and d > 0:
            url = f"https://example{(d - 1) % 97}.test/p/{d - 1:08d}"  # dup of prev
        text = doc_text(d, seed, vocab_size)
        html = _doc_html(d, text, seed, v)
        if invalid_every and d % invalid_every == invalid_every - 2:
            html = b"\xff\xfe" + html[:10]  # undecodable -> quarantine fixture
        urls.append(url)
        tss.append(base_ts + np.timedelta64(d * 137, "s"))
        htmls.append(html)
        texts.append(text)
        langs.append(_LANGS[int(lang_pick[j])])
    return pd.DataFrame(
        {
            "doc_id": ids,  # dense deterministic docID (SURVEY.md section 1.3)
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def corpus_df(
    spark,
    n_docs: int,
    seed: int = DEFAULT_SEED,
    vocab_size: int = DEFAULT_VOCAB,
    partitions: int | None = None,
    invalid_every: int = 0,
    dup_url_every: int = 0,
):
    """Distributed generation: spark.range -> mapInPandas (Arrow batches).

    Deterministic under any partitioning (counter-based hashing), the analog
    of the reference's round-robin worker sharding being order-independent
    (/root/reference/src/dataloader/dataset.py:312-336).
    """
    rng = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield corpus_pandas(
                pdf["id"].to_numpy(), seed, vocab_size, invalid_every, dup_url_every
            )

    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)
