"""Stateful HTML -> text extraction stage (actor pool).

This fills the reference's T1 slot: the lenient parser the reference
constructs per parse call (``ejp_zip.py:41-45``) becomes state built
ONCE per actor in ``__init__`` and reused across batches via
``Dataset.map_batches(HtmlTextExtractor, concurrency=N,
batch_format='pyarrow', zero_copy_batch=True)``. The extraction itself
is the byte-identical invariant pinned in :mod:`..functions.text`; it is
a pure function of the ``html`` bytes (no clock — see SURVEY §"hard
parts"), so retries and replays always produce identical text.

The stage also drops the ``html`` payload column immediately after
extraction — at 100 TB the raw bytes dominate block size, and nothing
downstream needs them (projection pushdown at the earliest point).
"""
from __future__ import annotations

import re

import pyarrow as pa

from ..functions.text import extract_text_column


class HtmlTextExtractor:
    """Actor-pool callable: adds ``text`` extracted from ``html``.

    Parameters
    ----------
    url_exclusion_pattern:
        Optional regex; rows whose ``url`` matches are dropped before
        extraction (the reference's filename-exclusion filter,
        ``ejp_zip.py:61-63`` / ``xml_config.py:65-67``).
    drop_html:
        Drop the raw payload column after extraction (default True).
    """

    def __init__(
        self,
        url_exclusion_pattern: str | None = None,
        drop_html: bool = True,
    ):
        # Built once per actor: compiled exclusion regex (RE2 pattern for
        # the vectorized path is stateless module config).
        self._exclusion = (
            re.compile(url_exclusion_pattern) if url_exclusion_pattern else None
        )
        self._exclusion_pattern = url_exclusion_pattern
        self._drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self._exclusion_pattern is not None:
            # Vectorized anti-filter; `match_substring_regex` is an
            # unanchored search, so anchor semantics follow re.match via ^.
            mask = pc.invert(
                pc.match_substring_regex(
                    batch.column("url"), "^(?:" + self._exclusion_pattern + ")"
                )
            )
            batch = batch.filter(mask)
        if batch.num_rows == 0:
            out = batch
            if "text" not in out.column_names:
                out = out.append_column("text", pa.array([], type=pa.string()))
        else:
            text = extract_text_column(batch.column("html"))
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            out = batch.append_column("text", text)
        if self._drop_html and "html" in out.column_names:
            out = out.drop_columns(["html"])
        return out
