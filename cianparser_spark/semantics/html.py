"""Minimal deterministic HTML scanning utilities.

The reference parses pages with BeautifulSoup CSS selectors.  Neither
bs4 nor lxml is available in this environment, and the pages this
engine processes come from the deterministic synthetic web
(``cianparser_spark.corpus.webgen``), which emits well-formed HTML with
double-quoted attributes.  These helpers implement exactly the selector
shapes the reference relies on — attribute-qualified block extraction
and in-order span text listing — with a balanced-tag scanner, so the
extraction semantics (``extract.py``) mirror the reference's selector
semantics 1:1:

  select("article[data-name='CardComponent']")   -> blocks(html, "article", "data-name", "CardComponent")
  select("div[data-name='LinkArea']")            -> blocks(block, "div", "data-name", "LinkArea")
  select("span")                                 -> span_texts(html)

Everything here is pure Python + re, import-safe inside Arrow UDF
batches.
"""

from __future__ import annotations

import re
from functools import lru_cache

_TAG_TEXT_RE = re.compile(r"<[^>]+>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


@lru_cache(maxsize=64)
def _open_tag_re(tag: str, attr: str, value: str) -> re.Pattern[str]:
    return re.compile(
        rf"<{tag}\b[^>]*\b{re.escape(attr)}=\"{re.escape(value)}\"[^>]*>"
    )


@lru_cache(maxsize=16)
def _any_tag_re(tag: str) -> re.Pattern[str]:
    return re.compile(rf"<(/?){tag}\b[^>]*>")


def _balanced_end(html: str, tag: str, open_end: int) -> int:
    """Index just past the close tag matching the open tag ending at open_end."""
    depth = 1
    for m in _any_tag_re(tag).finditer(html, open_end):
        if m.group(1):  # closing
            depth -= 1
            if depth == 0:
                return m.end()
        else:
            depth += 1
    return len(html)


@lru_cache(maxsize=64)
def _blocks_cached(html: str, tag: str, attr: str, value: str) -> tuple[str, ...]:
    out: list[str] = []
    pos = 0
    pat = _open_tag_re(tag, attr, value)
    while True:
        m = pat.search(html, pos)
        if m is None:
            return tuple(out)
        end = _balanced_end(html, tag, m.end())
        out.append(html[m.start():end])
        pos = end


def blocks(html: str, tag: str, attr: str, value: str) -> list[str]:
    """All ``<tag attr="value">...</tag>`` blocks (outer HTML, in order).

    Several extractors query the SAME card with the same selector
    (LinkArea, GeneralInfoSectionRowComponent …), so the scan is
    memoized on the fragment string; the cached tuple is copied to a
    fresh list per call."""
    return list(_blocks_cached(html, tag, attr, value))


@lru_cache(maxsize=64)
def first_block(html: str, tag: str, attr: str, value: str) -> str | None:
    m = _open_tag_re(tag, attr, value).search(html)
    if m is None:
        return None
    return html[m.start():_balanced_end(html, tag, m.end())]


def text(fragment: str) -> str:
    """Concatenated text content (tags stripped), like bs4 ``.text``."""
    return _TAG_TEXT_RE.sub("", _COMMENT_RE.sub("", fragment))


_SPAN_RE = re.compile(r"<span\b[^>]*>(.*?)</span>", re.S)


@lru_cache(maxsize=64)
def _span_texts_cached(fragment: str) -> tuple[str, ...]:
    return tuple(text(m.group(1)) for m in _SPAN_RE.finditer(fragment))


def span_texts(fragment: str) -> list[str]:
    """Text of every non-nested ``<span>`` in document order.

    The synthetic web never nests spans, so a non-greedy scan is exact.
    Memoized on the fragment (extractors re-query the same card).
    """
    return list(_span_texts_cached(fragment))


_A_RE = re.compile(r"<a\b[^>]*\bhref=\"([^\"]*)\"[^>]*>", re.S)


def first_href(fragment: str) -> str | None:
    m = _A_RE.search(fragment)
    return m.group(1) if m else None


def attr_values(fragment: str, attr: str) -> list[str]:
    """All values of ``attr`` across tags, in order (e.g. data-image-id)."""
    return re.findall(rf"\b{re.escape(attr)}=\"([^\"]*)\"", fragment)


def anchors(fragment: str, attr: str, value: str) -> list[tuple[str, str]]:
    """(href, text) for each ``<a attr="value" ...>text</a>``."""
    pat = re.compile(
        rf"<a\b[^>]*\b{re.escape(attr)}=\"{re.escape(value)}\"[^>]*"
        rf"\bhref=\"([^\"]*)\"[^>]*>(.*?)</a>|"
        rf"<a\b[^>]*\bhref=\"([^\"]*)\"[^>]*\b{re.escape(attr)}=\"{re.escape(value)}\"[^>]*>(.*?)</a>",
        re.S,
    )
    out = []
    for m in pat.finditer(fragment):
        href = m.group(1) if m.group(1) is not None else m.group(3)
        label = m.group(2) if m.group(2) is not None else m.group(4)
        out.append((href, text(label)))
    return out
