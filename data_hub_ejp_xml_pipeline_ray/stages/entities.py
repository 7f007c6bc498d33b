"""Nested-entity extraction: one page fans out to multiple typed entity
streams with nested list<struct> columns.

This is the analog of the reference's document parsers: a manuscript
XML fans out to persons + manuscript + versions entity streams
(``ejp_manuscript_xml.py:549-602``), each a dict with nested
lists-of-structs built by ``extract_list`` combinators
(``extract.py:18-24``; sub-extractors ``ejp_manuscript_xml.py:92-527``).
Here a web page fans out to:

* ``page``    — url, title, counts (the manuscript-level record)
* ``link``    — one row per ``<a href>`` with ``link_index`` provenance
  (the ``node_index`` analog, ``ejp_person_xml.py:166-169``)
* ``heading`` — one row per ``<h1>``-``<h6>``

plus a nested single-table form (:func:`extract_page_records`) where
links/headings are Arrow ``list<struct>`` columns — the reference's
row-with-nested-lists shape mapped to Arrow types (SURVEY §1.4).

Extraction state (compiled regexes) is built once per actor.
"""
from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa

from ..functions.text import strip_markup

_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title\s*>")
_LINK_RE = re.compile(r"""(?is)<a\b[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')[^>]*>(.*?)</a\s*>""")
_HEADING_RE = re.compile(r"(?is)<h([1-6])[^>]*>(.*?)</h[1-6]\s*>")


def _clean_text(fragment: str) -> str:
    """Inner markup stripped + double entity decode (same contract as
    the text invariant, applied to a fragment)."""
    return html_mod.unescape(html_mod.unescape(strip_markup(fragment)))


def parse_page_entities(url: str, raw_html: bytes | str | None) -> dict:
    """Pure per-page parser (the spec): returns title, links, headings."""
    if raw_html is None:
        return {"url": url, "title": None, "links": [], "headings": []}
    if isinstance(raw_html, bytes):
        doc = raw_html.decode("utf-8", errors="replace")
    else:
        doc = raw_html
    m = _TITLE_RE.search(doc)
    title = _clean_text(m.group(1)) if m else None
    links = []
    for i, lm in enumerate(_LINK_RE.finditer(doc)):
        href = lm.group(1) if lm.group(1) is not None else lm.group(2)
        links.append(
            {"href": html_mod.unescape(href), "anchor": _clean_text(lm.group(3)),
             "link_index": i}
        )
    headings = [
        {"level": int(hm.group(1)), "text": _clean_text(hm.group(2))}
        for hm in _HEADING_RE.finditer(doc)
    ]
    return {"url": url, "title": title, "links": links, "headings": headings}


LINK_STRUCT = pa.struct(
    [("href", pa.string()), ("anchor", pa.string()), ("link_index", pa.int32())]
)
HEADING_STRUCT = pa.struct([("level", pa.int32()), ("text", pa.string())])

PAGE_RECORDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("links", pa.list_(LINK_STRUCT)),
        ("headings", pa.list_(HEADING_STRUCT)),
        ("n_links", pa.int32()),
        ("n_headings", pa.int32()),
    ]
)

ENTITY_FANOUT_SCHEMA = pa.schema(
    [
        ("entity_type", pa.string()),
        ("url", pa.string()),
        ("title", pa.string()),      # page rows
        ("href", pa.string()),       # link rows
        ("anchor", pa.string()),     # link rows
        ("link_index", pa.int32()),  # link rows (node_index provenance)
        ("level", pa.int32()),       # heading rows
        ("text", pa.string()),       # heading rows
    ]
)


class PageEntityExtractor:
    """Actor-pool stage: page -> nested single-row records
    (``mode='nested'``) or fan-out entity rows (``mode='fanout'``,
    the M6 one-row-to-N-streams shape; split downstream with
    ``ds.filter(entity_type == ...)``)."""

    def __init__(self, mode: str = "nested", url_col: str = "url",
                 html_col: str = "html"):
        if mode not in ("nested", "fanout"):
            raise ValueError(f"unknown mode {mode!r}")
        self._mode = mode
        self._url_col = url_col
        self._html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self._url_col).to_pylist()
        htmls = batch.column(self._html_col).to_pylist()
        parsed = [parse_page_entities(u, h) for u, h in zip(urls, htmls)]
        if self._mode == "nested":
            rows = [
                {
                    "url": p["url"],
                    "title": p["title"],
                    "links": p["links"],
                    "headings": p["headings"],
                    "n_links": len(p["links"]),
                    "n_headings": len(p["headings"]),
                }
                for p in parsed
            ]
            return pa.Table.from_pylist(rows, schema=PAGE_RECORDS_SCHEMA)
        rows = []
        for p in parsed:
            rows.append(
                {"entity_type": "page", "url": p["url"], "title": p["title"]}
            )
            for link in p["links"]:
                rows.append(
                    {"entity_type": "link", "url": p["url"], **link}
                )
            for h in p["headings"]:
                rows.append(
                    {"entity_type": "heading", "url": p["url"], **h}
                )
        return pa.Table.from_pylist(rows, schema=ENTITY_FANOUT_SCHEMA)
