"""Dead-letter quarantine (M4 parity): rows with invalid-UTF-8 html or
null contract keys land in <lake>/_errors with provenance; good rows in
the same segment merge normally (reference behavior:
ParseDocumentError wrapping, ejp_xml_pipeline/transform_zip_xml/
ejp_xml.py:20-42)."""
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import (
    CdcConfig,
    lake_snapshot,
    read_errors,
    run_ingest,
)
from data_hub_ejp_xml_pipeline_ray.schemas import EVENTS_SCHEMA_V1
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal
from data_hub_ejp_xml_pipeline_ray.state.checkpoint import load_manifest


def _corrupt_segment(path: str):
    ts = datetime(2025, 6, 1, tzinfo=timezone.utc)
    rows = {
        "op": ["update", "update", "update", "update"],
        "url": ["https://good.example/", None,
                "https://bad-utf8.example/", "https://good2.example/"],
        "warc_ts": [ts, ts, ts, ts],
        "seq": [1, 2, 3, 4],
        "html": [b"good page one", b"orphan row",
                 b"\xff\xfe broken \x80 bytes", b"good page two"],
        "lang": ["en"] * 4,
        "schema_version": [1] * 4,
        "fetch_status": [200] * 4,
    }
    pq.write_table(pa.Table.from_pydict(rows, schema=EVENTS_SCHEMA_V1), path)


def test_corrupt_rows_quarantined_good_rows_merge(tmp_path):
    tmp = str(tmp_path)
    wal = os.path.join(tmp, "wal")
    generate_wal(wal, seed=31, n_urls=20, n_events=100, n_segments=2)
    _corrupt_segment(os.path.join(wal, "segment-00002.parquet"))
    cfg = CdcConfig(wal_dir=wal, lake_dir=os.path.join(tmp, "lake"),
                    num_partitions=4, extract_concurrency=2)
    run_ingest(cfg)

    errs = read_errors(cfg.lake_dir)
    assert errs.num_rows == 2
    by_err = dict(zip(errs.column("url").to_pylist(),
                      errs.column("error").to_pylist()))
    assert by_err[None] == "null_key_field"
    assert by_err["https://bad-utf8.example/"] == "invalid_utf8_html"
    # provenance names the corrupt segment
    assert set(errs.column("_src_segment").to_pylist()) == {
        "segment-00002.parquet"
    }
    # original payload preserved for replay/debugging
    assert b"\xff\xfe broken \x80 bytes" in errs.column("html").to_pylist()

    # good rows of the SAME corrupt segment merged normally
    snap = lake_snapshot(cfg.lake_dir)
    urls = set(snap.column("url").to_pylist())
    assert {"https://good.example/", "https://good2.example/"} <= urls
    texts = dict(zip(snap.column("url").to_pylist(),
                     snap.column("text").to_pylist()))
    assert texts["https://good.example/"] == "good page one"
    # quarantined url never entered the lake
    assert "https://bad-utf8.example/" not in urls

    # counters + lineage record the quarantine
    m = load_manifest(cfg.lake_dir)
    assert m.counters.get("error_rows") == 2
    assert m.lineage[-1]["error_rows"] == 2


def test_clean_ingest_has_no_error_rows(tmp_path):
    tmp = str(tmp_path)
    generate_wal(os.path.join(tmp, "wal"), seed=33, n_urls=10, n_events=60,
                 n_segments=2)
    cfg = CdcConfig(wal_dir=os.path.join(tmp, "wal"),
                    lake_dir=os.path.join(tmp, "lake"),
                    num_partitions=4, extract_concurrency=2)
    run_ingest(cfg)
    assert read_errors(cfg.lake_dir).num_rows == 0
    assert "error_rows" not in load_manifest(cfg.lake_dir).counters


def test_entity_lake_quarantines_corrupt_rows(tmp_path):
    """The demuxed entity ingest shares the dead-letter path: corrupt
    rows land in _errors, good rows fan out to entity rows."""
    from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import run_entity_ingest

    tmp = str(tmp_path)
    wal = os.path.join(tmp, "wal")
    generate_wal(wal, seed=37, n_urls=10, n_events=60, n_segments=1,
                 rich_pages=True)
    _corrupt_segment(os.path.join(wal, "segment-00001.parquet"))
    cfg = CdcConfig(wal_dir=wal, lake_dir=os.path.join(tmp, "lake"),
                    num_partitions=4, extract_concurrency=2)
    run_entity_ingest(cfg)
    errs = read_errors(cfg.lake_dir)
    assert errs.num_rows == 2
    snap = lake_snapshot(cfg.lake_dir)
    urls = set(snap.column("url").to_pylist())
    assert "https://bad-utf8.example/" not in urls
    assert {"https://good.example/", "https://good2.example/"} <= urls
    # good corrupt-segment rows produced page entity rows
    pages = snap.filter(
        pa.compute.equal(snap.column("entity_type"), "page")
    )
    assert {"https://good.example/", "https://good2.example/"} <= set(
        pages.column("url").to_pylist()
    )
