"""FROZEN html -> text extractor. DO NOT CHANGE THE ALGORITHM.

The engine's acceptance gate requires the extracted ``text`` column to be
byte-identical per url between the Spark UDF and the single-node oracle
(BASELINE.json:15 "byte-identical extracted text per url"). This module is
that reference extractor: a pure function of the html bytes, stdlib-only
(html.parser — no third-party lib whose minor version could change output;
SURVEY.md §7 hard-part #2). Both the Spark featurize stage and
crawlfe/oracle.py call *this exact function*, and the synthetic pages
generator uses it to materialize the golden ``text`` column.

Role in the reference pipeline shape: the payload-decode step — the analog
of the audio decode in ref: acoss/features.py::AudioFeatures.__init__ [R]
(bytes in, canonical per-entity signal out).

Algorithm (frozen, v1):
  1. decode html bytes as UTF-8 with errors="replace"
  2. parse with html.parser.HTMLParser (convert_charrefs=True, so entity
     and character references arrive decoded)
  3. drop all character data inside <script>, <style>, <noscript>,
     <template> elements (nesting-depth tracked)
  4. starting a new BLOCK tag (open or close) emits a line break; all other
     character data accumulates into the current line
  5. per line: collapse every run of whitespace to a single ASCII space,
     strip; drop empty lines
  6. join surviving lines with "\n"; no trailing newline
"""

from __future__ import annotations

from html.parser import HTMLParser

EXTRACTOR_VERSION = 1

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "br", "caption",
        "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
        "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
        "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
        "table", "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
    }
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._lines: list[str] = []
        self._cur: list[str] = []

    def _break(self) -> None:
        if self._cur:
            self._lines.append("".join(self._cur))
            self._cur = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag in _BLOCK_TAGS:
            self._break()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK_TAGS:
            self._break()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._break()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._cur.append(data)

    def result(self) -> str:
        self._break()
        out: list[str] = []
        for line in self._lines:
            collapsed = " ".join(line.split())
            if collapsed:
                out.append(collapsed)
        return "\n".join(out)


def extract_text(html: bytes | bytearray | memoryview | None) -> str:
    """The frozen reference extractor: html bytes -> canonical text."""
    if html is None:
        return ""
    raw = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(raw)
    p.close()
    return p.result()
