"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, language-ID, document fingerprinting.

All counting kernels are vectorized RE2 calls (``pyarrow.compute``) and
are defined so the exact same semantics are expressible in ANSI SQL
(DuckDB also uses RE2) — the driver's oracle comparison depends on that
parity. Keep every formula here in lock-step with
``pipelines/queries.py``'s SQL strings.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: A "token" is a maximal alphanumeric run (BPE-ish pre-tokenization).
TOKEN_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"

#: Per-language stopword marker sets (disjoint across languages so the
#: argmax is stable). Order = deterministic tie-break preference.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ein", "ist"),
    "fr": ("le", "les", "et", "dans", "est"),
    "es": ("el", "los", "las", "una", "y"),
}
UNKNOWN_LANG = "und"


def _count_regex(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    out = pc.count_substring_regex(col, pattern=pattern)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out.cast(pa.int64())


def token_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of alphanumeric runs. SQL parity:
    ``length(regexp_extract_all(text, '[A-Za-z0-9]+'))``."""
    return _count_regex(text, TOKEN_RE)


def char_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """UTF-8 code-point count. SQL parity: ``length(text)``."""
    out = pc.utf8_length(text)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out.cast(pa.int64())


def punct_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    return _count_regex(text, PUNCT_RE)


def stopword_pattern(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_count(text_lower: pa.ChunkedArray | pa.Array, lang: str = "en") -> pa.Array:
    """Count of marker stopwords. Input must be lowercased. SQL parity:
    ``length(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b'))``."""
    return _count_regex(text_lower, stopword_pattern(LANG_STOPWORDS[lang]))


def quality_score(
    n_tokens: pa.Array, n_chars: pa.Array, n_punct: pa.Array, n_stop: pa.Array
) -> pa.Array:
    """Deterministic document quality score in [0, 1], rounded to 4
    decimals. SQL parity (see ``queries.py``):

        round( least(n_tokens, 200) / 200.0 * 0.5
             + n_stop  / greatest(n_tokens, 1) * 0.3
             + (1 - n_punct / greatest(n_chars, 1)) * 0.2 , 4)
    """
    nt = n_tokens.cast(pa.float64())
    nc = n_chars.cast(pa.float64())
    np_ = n_punct.cast(pa.float64())
    ns = n_stop.cast(pa.float64())
    len_part = pc.multiply(pc.divide(pc.min_element_wise(nt, 200.0), 200.0), 0.5)
    stop_part = pc.multiply(pc.divide(ns, pc.max_element_wise(nt, 1.0)), 0.3)
    punct_part = pc.multiply(
        pc.subtract(1.0, pc.divide(np_, pc.max_element_wise(nc, 1.0))), 0.2
    )
    score = pc.add(pc.add(len_part, stop_part), punct_part)
    # Round via scale->int->divide with half-away-from-zero: yields the
    # canonical double for x.dddd and matches DuckDB's round() tie
    # behavior (Arrow's default is half-to-even; DuckDB rounds ties away
    # from zero).
    return pc.divide(
        pc.round(
            pc.multiply(score, 10000.0), ndigits=0,
            round_mode="half_towards_infinity",
        ),
        10000.0,
    )


def lang_id(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """N-gram-heuristic language ID: argmax of per-language marker-
    stopword counts over lowercased text; ``'und'`` when all counts are
    zero. Deterministic tie-break: first language in ``LANG_STOPWORDS``
    order wins (strictly-greater comparison for later entries — mirrors
    the nested CASE in the SQL oracle)."""
    lower = pc.utf8_lower(text)
    counts = {
        code: stopword_count(lower, code) for code in LANG_STOPWORDS
    }
    langs = list(LANG_STOPWORDS)
    best_lang = pa.array([UNKNOWN_LANG] * len(lower), type=pa.string())
    best_count = pa.array([0] * len(lower), type=pa.int64())
    for code in langs:
        c = counts[code]
        better = pc.greater(c, best_count)
        best_lang = pc.if_else(better, pa.scalar(code, type=pa.string()), best_lang)
        best_count = pc.if_else(better, c, best_count)
    return best_lang


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def fingerprint_text(text: str | None) -> int | None:
    """Rolling polynomial hash over the document's tokens (order-
    sensitive document fingerprint), mod 2^61-1. Pure Python reference
    used per row; not SQL-expressible (rows-only oracle)."""
    import re as _re

    if text is None:
        return None
    h = 0
    for tok in _re.findall(TOKEN_RE, text):
        th = 0
        for ch in tok.encode("utf-8"):
            th = (th * 31 + ch) % _FP_MOD
        h = (h * _FP_BASE + th + 1) % _FP_MOD
    return h


def fingerprint_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pa.array([fingerprint_text(t) for t in text.to_pylist()], type=pa.int64())
