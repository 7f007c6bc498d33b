"""Nested-entity extraction vs generator ground truth (the reference's
parser-fan-out shape: one document -> typed entity streams with nested
list<struct> columns and node_index provenance)."""
import random

import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_rich_page
from data_hub_ejp_xml_pipeline_ray.stages.entities import (
    ENTITY_FANOUT_SCHEMA,
    PAGE_RECORDS_SCHEMA,
    PageEntityExtractor,
    parse_page_entities,
)


def _pages(n=50, seed=13):
    rng = random.Random(seed)
    rows, truths = [], []
    for i in range(n):
        html, truth = generate_rich_page(rng, version=i)
        url = f"https://site-{i}.example/p"
        rows.append({"url": url, "html": html})
        truths.append({"url": url, **truth})
    return rows, truths


def test_parser_matches_ground_truth():
    rows, truths = _pages()
    for row, truth in zip(rows, truths):
        got = parse_page_entities(row["url"], row["html"])
        assert got["title"] == truth["title"]
        assert got["links"] == truth["links"]
        assert [h for h in got["headings"]] == truth["headings"]


def test_parser_edge_cases():
    assert parse_page_entities("u", None) == {
        "url": "u", "title": None, "links": [], "headings": []
    }
    got = parse_page_entities("u", b"<a href='x'>one</a> no title")
    assert got["title"] is None
    assert got["links"] == [{"href": "x", "anchor": "one", "link_index": 0}]
    # entity-encoded href decodes once
    got = parse_page_entities("u", b'<a href="a?x=1&amp;y=2">t</a>')
    assert got["links"][0]["href"] == "a?x=1&y=2"


def test_nested_mode_dataset():
    rows, truths = _pages(30)
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(
        PageEntityExtractor,
        fn_constructor_kwargs={"mode": "nested"},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.equals(PAGE_RECORDS_SCHEMA)
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    for truth in truths:
        got = by_url[truth["url"]]
        assert got["title"] == truth["title"]
        assert got["links"] == truth["links"]
        assert got["n_links"] == len(truth["links"])


def test_fanout_mode_streams():
    rows, truths = _pages(20)
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(
        PageEntityExtractor,
        fn_constructor_kwargs={"mode": "fanout"},
        batch_format="pyarrow", concurrency=2,
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.equals(ENTITY_FANOUT_SCHEMA)
    rows_py = tbl.to_pylist()
    pages = [r for r in rows_py if r["entity_type"] == "page"]
    links = [r for r in rows_py if r["entity_type"] == "link"]
    assert len(pages) == 20
    expected_links = sum(len(t["links"]) for t in truths)
    assert len(links) == expected_links
    # provenance: link_index dense per url
    by_url = {}
    for r in links:
        by_url.setdefault(r["url"], []).append(r["link_index"])
    for url, idxs in by_url.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_bad_mode():
    with pytest.raises(ValueError):
        PageEntityExtractor(mode="wat")
