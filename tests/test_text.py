"""Byte-identical text extraction: engine (vectorized Arrow kernels) vs
the pure-Python specification oracle, over hand cases + the generated
page grammar (mirrors the reference's entity-decode and child-text
contracts, ``tests/unit_test/utils/xml_test.py``)."""
import random

import pyarrow as pa
import pytest

from data_hub_ejp_xml_pipeline_ray.functions.text import (
    decode_entities,
    extract_text_column,
    extract_text_reference,
)
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_page

CASES = [
    (b"<p>hello world</p>", "hello world"),
    (b"<p>a&amp;b</p>", "a&b"),
    # double-encoded entity decodes twice (parse-time + explicit unescape)
    (b"<p>it&amp;apos;s</p>", "it's"),
    (b"<p>caf&#233; &#x00fc;ber</p>", "café über"),
    (b"<div><span>nested</span> text</div>", "nested text"),
    (b"before<!-- a <b>comment</b> -->after", "beforeafter"),
    (b"x<script>var a = 1 < 2;</script>y", "xy"),
    (b"x<style>.a { color: red }</style>y", "xy"),
    (b"<p class='c' broken>attr</p>", "attr"),
    (b"<p>unclosed", "unclosed"),
    (b"", ""),
    (None, None),
    (b"plain text no markup", "plain text no markup"),
    ("café déjà".encode(), "café déjà"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_reference_spec(raw, expected):
    assert extract_text_reference(raw) == expected


def test_vectorized_matches_spec_on_cases():
    arr = pa.array([c[0] for c in CASES], type=pa.binary())
    out = extract_text_column(arr).to_pylist()
    assert out == [c[1] for c in CASES]


def test_vectorized_matches_spec_on_generated_grammar():
    rng = random.Random(7)
    pages = [generate_page(rng, version=i % 3) for i in range(200)]
    arr = pa.array([h for h, _ in pages], type=pa.binary())
    out = extract_text_column(arr).to_pylist()
    for (html_bytes, expected), got in zip(pages, out):
        # three-way agreement: generator ground truth == spec == engine
        assert extract_text_reference(html_bytes) == expected
        assert got == expected


def test_decode_entities_none_safe():
    assert decode_entities(None) is None
    assert decode_entities("a&apos;b") == "a'b"
    assert decode_entities("plain") == "plain"
