"""HTML → plain-text cleaning (reference F2: the only nontrivial ingest
transform, ``process_email_body.py:35-98``).

Reference semantics reproduced:

- drop ``<script>``/``<style>`` subtrees,
- links → ``text (href)`` when both exist, bare text otherwise, dropped
  when empty (link text is the concatenation of stripped descendant
  strings, matching ``get_text(strip=True)``),
- images → ``[Image: alt]`` when alt is meaningful (len > 3), else
  ``[Image]``; images inside a link contribute nothing (the reference
  rewrites links first),
- block elements (p, div, h1-h6) emit a paragraph break after their
  text; ``<br>`` emits a newline,
- list items get a ``• `` bullet and a trailing newline,
- HTML entities decode to their characters,
- whitespace cleanup: ≥3 newlines → 2, runs of spaces/tabs → one space,
  strip (the reference's exact regexes).

Implementation: stdlib ``html.parser.HTMLParser`` (single streaming
pass, no third-party deps) wrapped as an Arrow pandas UDF — Python
touches row data only inside the batch, per the engine's UDF policy.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_BLOCK_TAGS = frozenset({"p", "div", "h1", "h2", "h3", "h4", "h5", "h6"})
_SKIP_TAGS = frozenset({"script", "style"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._skip = 0
        self._in_a = 0
        self._a_text: list[str] = []
        self._a_href: str = ""

    # -- helpers -------------------------------------------------------------

    def _emit(self, s: str) -> None:
        if self._in_a:
            self._a_text.append(s)
        else:
            self.out.append(s)

    # -- parser events -------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._in_a += 1
            if self._in_a == 1:
                self._a_text = []
                self._a_href = dict(attrs).get("href") or ""
            return
        if tag == "br":
            self._emit("\n")
            return
        if tag == "li":
            self._emit("• ")
            return
        if tag == "img":
            if self._in_a:
                return  # links are rewritten first; images inside vanish
            alt = (dict(attrs).get("alt") or "").strip()
            self.out.append(f"[Image: {alt}]" if len(alt) > 3 else "[Image]")

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            if self._in_a:
                self._in_a -= 1
                if self._in_a == 0:
                    text = "".join(s.strip() for s in self._a_text)
                    if self._a_href and text:
                        self.out.append(f"{text} ({self._a_href})")
                    elif text:
                        self.out.append(text)
            return
        if tag in _BLOCK_TAGS:
            self._emit("\n\n")
        elif tag == "li":
            self._emit("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self._emit(data)


def html_to_text_py(html: str | None) -> str:
    if not html:
        return ""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    text = "".join(p.out)
    # the reference's exact whitespace cleanup (process_email_body.py:92-96)
    text = re.sub(r"\n\s*\n\s*\n", "\n\n", text)
    text = re.sub(r"[ \t]+", " ", text)
    return text.strip()


def html_to_text_col(col: Column) -> Column:
    @F.pandas_udf(StringType())
    def _clean(s: pd.Series) -> pd.Series:
        return s.map(html_to_text_py)

    return _clean(col)
