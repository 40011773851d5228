"""Deterministic HTML -> text extraction (the engine's "media decode").

Reference analog: media decode to fixed-rate chunks
(/root/reference/src/dataloader/dataset.py:213-336); our per-row invariant
(BASELINE.json.input_hint) is *byte-identical extracted text per url*, so the
extractor is pure stdlib (html.parser), pinned in-repo — no external HTML
library whose version could drift (the reference pins goldens the same way,
/root/reference/tests/test-kinetics-6.sh:124-142).

Extraction semantics (documented contract, mirrored by the corpus generator):
  * content inside <script> <style> <nav> <noscript> <template> <svg> is
    dropped (boilerplate);
  * <title> <p> <h1>..<h6> <li> <div> <section> <article> <blockquote> <tr>
    <br> open/close block boundaries;
  * entities are decoded (html.parser does this with convert_charrefs=True);
  * whitespace runs inside a block collapse to a single space, blocks are
    stripped, empty blocks dropped, blocks joined with '\n';
  * invalid UTF-8 input returns None -> the row is routed to quarantine
    (reference skips invalid media and reports counts,
    /root/reference/extract-features.py:81-84).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

_SKIP_TAGS = {"script", "style", "nav", "noscript", "template", "svg"}
_BLOCK_TAGS = {
    "title", "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div",
    "section", "article", "blockquote", "tr", "br", "ul", "ol", "table",
    "body", "head", "html", "header", "footer", "main",
}
_WS_RE = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._blocks: list[str] = []
        self._cur: list[str] = []

    def _flush(self) -> None:
        if self._cur:
            block = _WS_RE.sub(" ", "".join(self._cur)).strip()
            self._cur = []
            if block:
                self._blocks.append(block)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._cur.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def extract_text(html: bytes | str | None) -> str | None:
    """Extract visible text; None for undecodable/None input (quarantine)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        try:
            html = bytes(html).decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            return None
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return None
    return parser.result()


def _extract_series(s: pd.Series) -> pd.Series:
    return s.map(extract_text, na_action=None)


def extract_text_udf():
    """Scalar pandas_udf: BinaryType -> StringType (None = quarantine row)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def extract(s: pd.Series) -> pd.Series:
        return _extract_series(s)

    return extract
