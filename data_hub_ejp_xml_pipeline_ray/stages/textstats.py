"""Text-analysis stage: one vectorized ``map_batches`` pass adding
token/char/punct/stopword counts, quality score, heuristic language id
and a rolling-hash fingerprint to a document table. All kernels live in
:mod:`..functions.textstats` (kept in SQL-parity with the DuckDB
oracles in ``pipelines/queries.py``)."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textstats as ts


def annotate_text_stats(batch: pa.Table, text_col: str = "text",
                        with_fingerprint: bool = False) -> pa.Table:
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    n_tokens = ts.token_count(text)
    n_chars = ts.char_count(text)
    n_punct = ts.punct_count(text)
    n_stop = ts.stopword_count(lower, "en")
    batch = batch.append_column("n_tokens", n_tokens)
    batch = batch.append_column("n_chars_computed", n_chars)
    batch = batch.append_column("n_punct", n_punct)
    batch = batch.append_column("n_stop", n_stop)
    batch = batch.append_column(
        "quality", ts.quality_score(n_tokens, n_chars, n_punct, n_stop)
    )
    batch = batch.append_column("lang_pred", ts.lang_id(text))
    if with_fingerprint:
        batch = batch.append_column("fingerprint", ts.fingerprint_column(text))
    return batch
