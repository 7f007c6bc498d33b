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


def test_batch_kernel_matches_row_spec():
    # the vectorized batch kernel (extract_all -> explode ->
    # extract_groups) must agree with the per-row spec on every doc,
    # including null html, bad UTF-8, entity-encoded hrefs, empty
    # hrefs, markup inside anchors/headings and missing titles
    from data_hub_ejp_xml_pipeline_ray.stages.entities import (
        parse_page_entities_batch,
    )

    rng = random.Random(31)
    htmls = [generate_rich_page(rng, version=i)[0] for i in range(40)]
    htmls = [h.encode() if isinstance(h, str) else h for h in htmls]
    htmls += [
        None, b"", b"<a href='x'>one</a> no title",
        b'<a href="a?x=1&amp;y=2">t</a>',
        b"<title>T &amp;amp; U</title><h2>He<b>ad</b> &lt;x&gt;</h2>",
        b"<a href=''>e</a><A HREF='z'>Z</A>",
        b"\xff\xfe bad utf8 <a href='u'>v</a>",
        b"<h1>a</h1><h3>b</h3><a href='1'>x</a><a href=\"2\">y</a>",
    ]
    p = parse_page_entities_batch(pa.array(htmls, type=pa.binary()))
    li = hi = 0
    for i, h in enumerate(htmls):
        spec = parse_page_entities("u", h)
        assert p.title[i].as_py() == spec["title"], i
        nl = int(p.link_counts[i])
        nh = int(p.heading_counts[i])
        assert nl == len(spec["links"]) and nh == len(spec["headings"]), i
        for j in range(nl):
            assert {
                "href": p.link_href[li + j].as_py(),
                "anchor": p.link_anchor[li + j].as_py(),
                "link_index": p.link_index[li + j].as_py(),
            } == spec["links"][j], (i, j)
        for j in range(nh):
            assert {
                "level": p.heading_level[hi + j].as_py(),
                "text": p.heading_text[hi + j].as_py(),
            } == spec["headings"][j], (i, j)
        li += nl
        hi += nh
