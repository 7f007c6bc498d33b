"""HTML -> text extraction: the byte-identical per-url invariant.

The reference's text-extraction semantics are ``html.unescape(''.join(
node.itertext()))`` over a leniently parsed document
(``ejp_xml_pipeline/utils/xml_transform_util/xml.py:25-37``; lenient
parser construction ``transform_zip_xml/ejp_zip.py:41-45``): concatenate
every text node, then entity-decode the result. An XML parser resolves
source entities once while building text nodes, and the explicit
``html.unescape`` decodes a second time — so the end-to-end contract is:

    text = unescape(unescape(strip_markup(html)))

where ``strip_markup`` removes comments, script/style elements including
their content, and all tags, leaving raw text (entities still encoded).
This module pins that contract exactly; the spec function
:func:`extract_text_reference` is the oracle, and
:func:`extract_text_column` is the vectorized engine implementation
(RE2 kernels via ``pyarrow.compute`` — tags are stripped across a whole
Arrow column per kernel call, with Python touched only for rows that
still contain ``&``). Both must agree byte-for-byte on every input.
"""
from __future__ import annotations

import html
import re

import pyarrow as pa
import pyarrow.compute as pc

# Lenient-markup grammar handled: comments, script/style with content,
# ordinary (possibly unclosed / attribute-bearing / malformed-but-
# delimited) tags. A ``<`` that never closes is treated as text by
# neither impl matching ``<[^>]*>``, keeping the two aligned.
_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_TAG_RE = r"(?s)<[^>]*>"

_PY_COMMENT = re.compile(_COMMENT_RE)
_PY_SCRIPT = re.compile(_SCRIPT_RE)
_PY_STYLE = re.compile(_STYLE_RE)
_PY_TAG = re.compile(_TAG_RE)


def strip_markup(doc: str) -> str:
    """Remove comments, script/style blocks (with content) and tags."""
    doc = _PY_COMMENT.sub("", doc)
    doc = _PY_SCRIPT.sub("", doc)
    doc = _PY_STYLE.sub("", doc)
    return _PY_TAG.sub("", doc)


def decode_entities(text: str | None) -> str | None:
    """None-safe single entity decode (reference ``xml.py:25-26``)."""
    if text is None:
        return None
    return html.unescape(text)


def extract_text_reference(raw_html: bytes | str | None) -> str | None:
    """Pure-Python specification of the extraction invariant (the oracle).

    Mirrors ``html.unescape(''.join(itertext(parse(html, recover=True))))``
    — parse-time entity resolution plus the reference's explicit decode —
    as a double ``unescape`` over the tag-stripped source.
    """
    if raw_html is None:
        return None
    if isinstance(raw_html, bytes):
        raw_html = raw_html.decode("utf-8", errors="replace")
    return html.unescape(html.unescape(strip_markup(raw_html)))


def unescape_array(arr: pa.Array, times: int = 2) -> pa.Array:
    """Apply ``html.unescape`` ``times``-fold to a string array. Vector
    fast-path: rows without ``&`` are returned as-is (unescape is
    identity there); only rows containing ``&`` pay the Python call."""
    mask = pc.match_substring(arr, "&")
    if pc.any(mask).as_py() is not True:
        return arr
    py = arr.to_pylist()
    out = []
    for s in py:
        if s is not None and "&" in s:
            for _ in range(times):
                s = html.unescape(s)
        out.append(s)
    return pa.array(out, type=arr.type)


def _unescape_twice_array(arr: pa.Array) -> pa.Array:
    return unescape_array(arr, 2)


def html_to_string_array(html_col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """``binary`` html -> ``string`` with the reference's lenient decode
    (``errors="replace"``); whole-column zero-copy cast when the column
    is valid UTF-8, per-row fallback only otherwise."""
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(html_col.type):
        try:
            return html_col.cast(pa.string())
        except pa.ArrowInvalid:
            # Invalid UTF-8 somewhere: fall back to per-row lenient decode.
            return pa.array(
                [
                    None if b is None else b.decode("utf-8", errors="replace")
                    for b in html_col.to_pylist()
                ],
                type=pa.string(),
            )
    return html_col


def strip_markup_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized :func:`strip_markup` (4 RE2 kernel passes over the
    whole column)."""
    col = pc.replace_substring_regex(col, pattern=_COMMENT_RE, replacement="")
    col = pc.replace_substring_regex(col, pattern=_SCRIPT_RE, replacement="")
    col = pc.replace_substring_regex(col, pattern=_STYLE_RE, replacement="")
    col = pc.replace_substring_regex(col, pattern=_TAG_RE, replacement="")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def extract_text_column(html_col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized engine implementation of :func:`extract_text_reference`
    over a ``binary`` (or string) Arrow column. Null in -> null out."""
    col = html_to_string_array(html_col)
    return _unescape_twice_array(strip_markup_array(col))
