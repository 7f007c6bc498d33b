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


#: Entity-lake schema (the demuxed multi-entity table the reference
#: writes as 4 BQ tables; here one table with an ``entity_type``
#: discriminator + version columns + tombstone). Sparse columns are
#: null for rows of other entity kinds.
ENTITY_LAKE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("seq", pa.int64()),
        ("entity_type", pa.string()),
        ("title", pa.string()),
        ("href", pa.string()),
        ("anchor", pa.string()),
        ("link_index", pa.int32()),
        ("level", pa.int32()),
        ("text", pa.string()),
        ("_src_segment", pa.string()),
        ("_deleted", pa.bool_()),
    ]
)


class EntityExtractCombineSpill:
    """Fused map side for the ENTITY lake: conform wire batch ->
    event-level local LWW -> parse each winning event's html into
    entity rows (page/link/heading) stamped with the event's
    ``(warc_ts, seq)`` version -> partition split -> row-group spill.

    Delete events emit one tombstone row so the merge can retire a
    url's previous entity rows (group-valued LWW keeps ALL rows of the
    winning version; a tombstone IS that version's only row).
    """

    def __init__(self, staging_dir: str, num_partitions: int,
                 url_exclusion_pattern: str | None = None,
                 wire_schema: pa.Schema | None = None,
                 splits: frozenset[tuple[int, int]] | None = None,
                 errors_dir: str | None = None,
                 constraints: list | None = None,
                 purged_urls: list | None = None):
        from .merge import SpillCombiner, purged_value_set

        import pyarrow as _pa

        _pa.set_cpu_count(1)
        _pa.set_io_thread_count(2)
        self._spill = SpillCombiner(staging_dir, num_partitions, splits)
        self._exclusion = url_exclusion_pattern
        self._wire_schema = wire_schema
        self._errors_dir = errors_dir
        self._constraints = constraints
        self._purged = purged_value_set(purged_urls)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .merge import filter_purged, local_lww

        if "path" in batch.column_names:
            src_col = pc.replace_substring_regex(
                batch.column("path"), pattern=".*/", replacement=""
            )
            batch = batch.drop_columns(["path"]).append_column("_src_segment", src_col)
        batch = filter_purged(batch, self._purged)
        if self._exclusion is not None:
            mask = pc.invert(
                pc.match_substring_regex(
                    batch.column("url"), "^(?:" + self._exclusion + ")"
                )
            )
            batch = batch.filter(mask)
        err_manifest = None
        if self._errors_dir is not None and batch.num_rows:
            from .merge import ERROR_PART, quarantine_bad_rows, write_dead_letters

            batch, err, raw = quarantine_bad_rows(batch)
            if err is not None:
                path = write_dead_letters(self._errors_dir, err, raw)
                err_manifest = pa.table(
                    {"part": pa.array([ERROR_PART], pa.int64()),
                     "rows": pa.array([err.num_rows], pa.int64()),
                     "path": pa.array([path], pa.string()),
                     "row_group": pa.array([-1], pa.int64())}
                )
            if self._constraints:
                from .merge import check_constraints

                batch, cerr, craw = check_constraints(batch, self._constraints)
                if cerr is not None:
                    cpath = write_dead_letters(self._errors_dir, cerr, craw)
                    cman = pa.table(
                        {"part": pa.array([ERROR_PART], pa.int64()),
                         "rows": pa.array([cerr.num_rows], pa.int64()),
                         "path": pa.array([cpath], pa.string()),
                         "row_group": pa.array([-1], pa.int64())}
                    )
                    err_manifest = (
                        pa.concat_tables([err_manifest, cman])
                        if err_manifest is not None else cman
                    )
        if batch.num_rows == 0:
            empty = pa.table(
                {"part": pa.array([], pa.int64()),
                 "rows": pa.array([], pa.int64()),
                 "path": pa.array([], pa.string()),
                 "row_group": pa.array([], pa.int64())}
            )
            return pa.concat_tables([empty, err_manifest]) if err_manifest else empty
        batch = local_lww(batch)  # event-level combiner: winners only
        rows = []
        for r in batch.to_pylist():
            base = {
                "url": r["url"], "warc_ts": r["warc_ts"], "seq": r["seq"],
                "_src_segment": r.get("_src_segment"),
            }
            if r.get("op") == "delete":
                rows.append({**base, "entity_type": None, "_deleted": True})
                continue
            parsed = parse_page_entities(r["url"], r.get("html"))
            rows.append({**base, "entity_type": "page",
                         "title": parsed["title"], "_deleted": False})
            for link in parsed["links"]:
                rows.append({**base, "entity_type": "link", **link,
                             "_deleted": False})
            for h in parsed["headings"]:
                rows.append({**base, "entity_type": "heading", **h,
                             "_deleted": False})
        out = pa.Table.from_pylist(rows, schema=ENTITY_LAKE_SCHEMA)
        # the spill's own local_lww would collapse multi-row versions —
        # rows here are already event-winners, so spill WITHOUT another
        # row-level reduce: route through the partition splitter only
        spilled = self._spill.split_and_spill(out)
        return (
            pa.concat_tables([spilled, err_manifest]) if err_manifest else spilled
        )


def entity_lake_schema(_wire: pa.Schema) -> pa.Schema:
    """lake_schema_fn hook for the entity ingest (static schema; the
    wire schema's extra columns don't apply to entity rows)."""
    return ENTITY_LAKE_SCHEMA


#: Nested single-table lake: one row per url carrying its entities as
#: Arrow ``list<struct>`` columns — the reference's row-with-nested-
#: lists shape (persons[] / versions[] built by extract_list,
#: ejp_manuscript_xml.py:549-602) committed THROUGH the lake, not just
#: parsed in flight. v2 of the link struct adds ``rel`` (NESTED column
#: add — schema evolution inside a struct element, the
#: bq_data_service.py:142-188 recursive-union case).
def nested_lake_schema(version: int = 1) -> pa.Schema:
    link_fields = [
        ("href", pa.string()), ("anchor", pa.string()),
        ("link_index", pa.int32()),
    ]
    if version >= 2:
        link_fields.append(("rel", pa.string()))
    return pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("seq", pa.int64()),
            ("title", pa.string()),
            ("links", pa.list_(pa.struct(link_fields))),
            ("headings", pa.list_(HEADING_STRUCT)),
            ("n_links", pa.int32()),
            ("n_headings", pa.int32()),
            ("_src_segment", pa.string()),
            ("_deleted", pa.bool_()),
        ]
    )


def _site_of(url: str) -> str:
    m = re.match(r"https?://([^/]+)", url or "")
    return m.group(1) if m else ""


class NestedExtractCombineSpill:
    """Fused map side for the NESTED lake: conform -> event-level local
    LWW -> parse each winner into ONE row with ``list<struct>`` entity
    columns -> partition split -> spill. Row-valued LWW merges it (one
    row per url), so the nested columns ride the normal merge path —
    including schema evolution when ``struct_version=2`` adds ``rel``
    inside the link struct."""

    struct_version = 1

    def __init__(self, staging_dir: str, num_partitions: int,
                 url_exclusion_pattern: str | None = None,
                 wire_schema: pa.Schema | None = None,
                 splits: frozenset[tuple[int, int]] | None = None,
                 errors_dir: str | None = None,
                 constraints: list | None = None,
                 purged_urls: list | None = None):
        from .merge import SpillCombiner, purged_value_set

        import pyarrow as _pa

        _pa.set_cpu_count(1)
        _pa.set_io_thread_count(2)
        self._spill = SpillCombiner(staging_dir, num_partitions, splits)
        self._errors_dir = errors_dir
        self._constraints = constraints
        self._purged = purged_value_set(purged_urls)
        self._schema = nested_lake_schema(self.struct_version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .merge import (
            ERROR_PART, filter_purged, local_lww, quarantine_bad_rows,
            write_dead_letters,
        )

        if "path" in batch.column_names:
            src_col = pc.replace_substring_regex(
                batch.column("path"), pattern=".*/", replacement=""
            )
            batch = batch.drop_columns(["path"]).append_column("_src_segment", src_col)
        batch = filter_purged(batch, self._purged)
        err_manifest = None
        if self._errors_dir is not None and batch.num_rows:
            batch, err, raw = quarantine_bad_rows(batch)
            if err is not None:
                path = write_dead_letters(self._errors_dir, err, raw)
                err_manifest = pa.table(
                    {"part": pa.array([ERROR_PART], pa.int64()),
                     "rows": pa.array([err.num_rows], pa.int64()),
                     "path": pa.array([path], pa.string()),
                     "row_group": pa.array([-1], pa.int64())}
                )
            if self._constraints:
                from .merge import check_constraints

                batch, cerr, craw = check_constraints(batch, self._constraints)
                if cerr is not None:
                    cpath = write_dead_letters(self._errors_dir, cerr, craw)
                    cman = pa.table(
                        {"part": pa.array([ERROR_PART], pa.int64()),
                         "rows": pa.array([cerr.num_rows], pa.int64()),
                         "path": pa.array([cpath], pa.string()),
                         "row_group": pa.array([-1], pa.int64())}
                    )
                    err_manifest = (
                        pa.concat_tables([err_manifest, cman])
                        if err_manifest is not None else cman
                    )
        empty = pa.table(
            {"part": pa.array([], pa.int64()),
             "rows": pa.array([], pa.int64()),
             "path": pa.array([], pa.string()),
             "row_group": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return pa.concat_tables([empty, err_manifest]) if err_manifest else empty
        batch = local_lww(batch)
        rows = []
        for r in batch.to_pylist():
            base = {
                "url": r["url"], "warc_ts": r["warc_ts"], "seq": r["seq"],
                "_src_segment": r.get("_src_segment"),
            }
            if r.get("op") == "delete":
                rows.append({**base, "_deleted": True})
                continue
            p = parse_page_entities(r["url"], r.get("html"))
            links = p["links"]
            if self.struct_version >= 2:
                site = _site_of(r["url"])
                links = [
                    {**lk, "rel": ("internal" if _site_of(lk["href"]) == site
                                   else "external")}
                    for lk in links
                ]
            rows.append({
                **base, "title": p["title"], "links": links,
                "headings": p["headings"], "n_links": len(links),
                "n_headings": len(p["headings"]), "_deleted": False,
            })
        out = pa.Table.from_pylist(rows, schema=self._schema)
        spilled = self._spill.split_and_spill(out)
        return (
            pa.concat_tables([spilled, err_manifest]) if err_manifest else spilled
        )


class NestedExtractCombineSpillV2(NestedExtractCombineSpill):
    struct_version = 2


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
