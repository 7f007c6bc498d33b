"""Text-analysis kernels: golden values + DuckDB SQL parity (the same
formulas queries.py serves as oracles must agree on real data)."""
import duckdb
import pyarrow as pa

from data_hub_ejp_xml_pipeline_ray.functions import textstats as ts
from data_hub_ejp_xml_pipeline_ray.stages.textstats import annotate_text_stats

DOCS = [
    "The quick brown fox, and the lazy dog. To be or not to be!",
    "der hund und die katze ist ein tier",
    "le chat et les chiens est dans la maison",
    "el gato y los perros las casas una vez",
    "xyzzy plugh 12345",
    "",
]


def test_token_count_golden():
    arr = pa.array(DOCS)
    counts = ts.token_count(arr).to_pylist()
    assert counts[4] == 3
    assert counts[5] == 0
    assert counts[0] == len(
        [t for t in DOCS[0].replace(",", " ").replace(".", " ").replace("!", " ").split()]
    )


def test_lang_id_golden():
    arr = pa.array(DOCS)
    langs = ts.lang_id(arr).to_pylist()
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "fr"
    assert langs[3] == "es"
    assert langs[4] == "und"
    assert langs[5] == "und"


def test_sql_parity_counts_and_score():
    """The exact SQL served as oracle must reproduce the Arrow kernels."""
    table = pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    batch = annotate_text_stats(table)
    con = duckdb.connect()
    con.register("documents", table)
    sql = r"""
        SELECT doc_id,
               length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
               length(text) AS n_chars_computed,
               length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
               length(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS n_stop,
               round( least(length(regexp_extract_all(text, '[A-Za-z0-9]+')), 200) / 200.0 * 0.5
                    + length(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b'))
                      * 1.0 / greatest(length(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) * 0.3
                    + (1 - length(regexp_extract_all(text, '[.,;:!?]'))
                      * 1.0 / greatest(length(text), 1)) * 0.2, 4) AS quality
        FROM documents ORDER BY doc_id
    """
    oracle = con.execute(sql).arrow()
    for col in ["n_tokens", "n_chars_computed", "n_punct", "n_stop", "quality"]:
        assert batch.column(col).to_pylist() == oracle.column(col).to_pylist(), col


def test_fingerprint_deterministic_and_order_sensitive():
    a = ts.fingerprint_text("alpha beta gamma")
    b = ts.fingerprint_text("alpha beta gamma")
    c = ts.fingerprint_text("gamma beta alpha")
    assert a == b
    assert a != c
    assert ts.fingerprint_text(None) is None
    assert ts.fingerprint_text("") == 0


def test_gram_hash_batch_matches_python_reference_structure():
    """The vectorized gram kernel (polars shift-concat) produces exactly
    the python reference's gram boundaries: same gram COUNT per row and
    same duplicate structure (hash values differ by design — membership
    only ever compares hashes from the same kernel)."""
    import numpy as np
    import pyarrow as pa

    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import (
        _gram_hash_list,
        _gram_hashes_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short text",                       # < 8 tokens: zero grams
        None,                               # null text
        "",                                 # empty
        "a b c d e f g h i j k l m n o p",  # clean run
        "x! y? z. a b c d e f g h",         # punctuation splits
        "dup dup dup dup dup dup dup dup dup dup",  # repeated gram
    ]
    rid, h = _gram_hashes_batch(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        ref = _gram_hash_list(t)
        mine = h[rid == i]
        assert len(mine) == len(ref), (i, len(mine), len(ref))
        # duplicate structure: same multiset size after dedup
        assert len(np.unique(mine)) == len(set(ref)), i
