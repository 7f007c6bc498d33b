"""Everything-at-once integration: schema evolution (v2 segments) +
corrupt rows (dead-letter) + url exclusion + a partition split
mid-stream + idempotent re-ingest + compaction, converging to the
replay oracle over the clean, non-excluded rows."""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from data_hub_ejp_xml_pipeline_ray.functions.text import extract_text_reference
from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import (
    CdcConfig,
    lake_snapshot,
    read_errors,
    run_ingest,
)
from data_hub_ejp_xml_pipeline_ray.pipelines.maintenance import (
    compact_lake,
    split_partition,
)
from data_hub_ejp_xml_pipeline_ray.schemas import EVENTS_SCHEMA_V1
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal, naive_replay
from data_hub_ejp_xml_pipeline_ray.sources.wal import list_segments
from data_hub_ejp_xml_pipeline_ray.state.checkpoint import load_manifest

EXCLUDE = r"https://site-1\."


def _expected(wal_dir):
    import re

    tables = [pq.read_table(s.path) for s in list_segments(wal_dir)]
    final = naive_replay(tables)
    out = {}
    for url, row in final.items():
        if url is None or re.match(EXCLUDE, url):
            continue
        if row["html"] is not None:
            try:
                row["html"].decode("utf-8")
            except UnicodeDecodeError:
                continue  # engine quarantines undecodable rows
        out[url] = (row["warc_ts"], row["seq"],
                    extract_text_reference(row["html"]))
    return out


def _corrupt_segment(path, seq_base):
    from datetime import datetime, timezone

    ts = datetime(2025, 7, 1, tzinfo=timezone.utc)
    rows = {
        "op": ["update", "update"],
        "url": [None, "https://kitchen-bad.example/"],
        "warc_ts": [ts, ts],
        "seq": [seq_base, seq_base + 1],
        "html": [b"x", b"\xff\x80 bad"],
        "lang": ["en", "en"],
        "schema_version": [1, 1],
        "fetch_status": [200, 200],
    }
    pq.write_table(pa.Table.from_pydict(rows, schema=EVENTS_SCHEMA_V1), path)


def test_kitchen_sink_converges(tmp_path):
    tmp = str(tmp_path)
    wal = os.path.join(tmp, "wal")
    generate_wal(wal, seed=71, n_urls=60, n_events=600, n_segments=6,
                 delete_fraction=0.08, tie_fraction=0.05, v2_from_segment=4)
    _corrupt_segment(os.path.join(wal, "segment-00006.parquet"), 10_000)
    cfg = CdcConfig(wal_dir=wal, lake_dir=os.path.join(tmp, "lake"),
                    num_partitions=4, extract_concurrency=2,
                    max_segments_per_batch=3,
                    url_exclusion_pattern=EXCLUDE,
                    retain_versions=None)  # keep history for the feed leg

    # first micro-batches (3 segments), then split the largest partition
    import shutil
    held = ["segment-00004.parquet", "segment-00005.parquet",
            "segment-00006.parquet"]
    for s in held:
        shutil.move(os.path.join(wal, s), tmp)
    run_ingest(cfg)
    m = load_manifest(cfg.lake_dir)
    big = max(m.partition_meta, key=lambda p: m.partition_meta[p]["rows"])
    split_partition(cfg.lake_dir, big)

    # land the rest (incl. v2 schema + corrupt segment) and re-ingest
    for s in held:
        shutil.move(os.path.join(tmp, s), os.path.join(wal, s))
    run_ingest(cfg)
    run_ingest(cfg)  # idempotent no-op

    snap = lake_snapshot(cfg.lake_dir)
    got = {
        r["url"]: (r["warc_ts"], r["seq"], r["text"])
        for r in snap.to_pylist()
    }
    assert got == _expected(wal)
    # schema evolved: v2's content_type present in the lake schema
    assert "content_type" in load_manifest(cfg.lake_dir).schema.names
    # both corrupt rows quarantined with provenance
    errs = read_errors(cfg.lake_dir)
    assert errs.num_rows == 2
    assert set(errs.column("_src_segment").to_pylist()) == {
        "segment-00006.parquet"
    }
    # compaction drops tombstones, visible state unchanged
    before = lake_snapshot(cfg.lake_dir)
    compact_lake(cfg.lake_dir)
    assert lake_snapshot(cfg.lake_dir).equals(before)

    # --- change feed + consumers across the WHOLE gauntlet ------------
    # (v1 predates the split, the v2 schema, the quarantined segment
    # AND the compaction: the apply law must still hold)
    from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import changes_between
    from data_hub_ejp_xml_pipeline_ray.pipelines.incremental import (
        read_view,
        refresh_live_counts,
    )
    from data_hub_ejp_xml_pipeline_ray.pipelines.replicate import sync_replica

    cur = load_manifest(cfg.lake_dir).version
    state = {
        r["url"]: (r["warc_ts"], r["seq"], r["text"])
        for r in lake_snapshot(cfg.lake_dir, version=1).to_pylist()
    }
    for r in changes_between(cfg.lake_dir, 1, cur).take_all():
        if r["change_op"] == "delete":
            state.pop(r["url"], None)
        else:
            state[r["url"]] = (r["warc_ts"], r["seq"], r["text"])
    assert state == got  # apply(v1, feed(1 -> cur)) == final state

    rep = os.path.join(tmp, "replica")
    sync_replica(cfg.lake_dir, rep, at_version=1)
    r = sync_replica(cfg.lake_dir, rep)
    assert r["mode"] == "incremental"
    rep_rows = {
        r_["url"]: (r_["warc_ts"], r_["seq"], r_["text"])
        for r_ in lake_snapshot(rep).to_pylist()
    }
    assert rep_rows == got

    import collections

    view = os.path.join(tmp, "view")
    refresh_live_counts(cfg.lake_dir, view, "lang", at_version=1)
    assert refresh_live_counts(cfg.lake_dir, view)["mode"] == "incremental"
    exp_counts = collections.Counter(
        r["lang"] for r in lake_snapshot(cfg.lake_dir).to_pylist()
    )
    assert {
        v["lang"]: v["n"] for v in read_view(view).to_pylist()
    } == dict(exp_counts)
