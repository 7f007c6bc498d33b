"""End-to-end CDC engine tests on synthetic WAL fixtures (FIXTURES.md §3):
replay equivalence, LWW + seq tiebreak, deletes, idempotent redelivery,
kill/resume convergence, schema evolution, exclusion filter, hot-key skew.
The oracle is an independent pure-Python replay (``naive_replay``)."""
import os
import shutil

import pyarrow.parquet as pq
import pytest

from data_hub_ejp_xml_pipeline_ray.functions.text import extract_text_reference
from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import (
    CdcConfig,
    lake_snapshot,
    read_lake,
    run_ingest,
)
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal, naive_replay
from data_hub_ejp_xml_pipeline_ray.sources.wal import list_segments
from data_hub_ejp_xml_pipeline_ray.state.checkpoint import load_manifest


def _expected_lake(wal_dir):
    tables = [pq.read_table(s.path) for s in list_segments(wal_dir)]
    final = naive_replay(tables)
    return {
        url: {
            "warc_ts": row["warc_ts"],
            "seq": row["seq"],
            "text": extract_text_reference(row["html"]),
            "lang": row["lang"],
        }
        for url, row in final.items()
    }


def _snapshot_dict(lake_dir):
    table = lake_snapshot(lake_dir)
    return {
        r["url"]: {
            "warc_ts": r["warc_ts"],
            "seq": r["seq"],
            "text": r["text"],
            "lang": r["lang"],
        }
        for r in table.to_pylist()
    }


def _cfg(tmp, **kw):
    defaults = dict(
        wal_dir=os.path.join(tmp, "wal"),
        lake_dir=os.path.join(tmp, "lake"),
        num_partitions=8,
        extract_concurrency=2,
    )
    defaults.update(kw)
    return CdcConfig(**defaults)


@pytest.fixture()
def small_wal(tmp_path):
    tmp = str(tmp_path)
    generate_wal(
        os.path.join(tmp, "wal"),
        seed=11,
        n_urls=40,
        n_events=400,
        n_segments=8,
        delete_fraction=0.08,
        tie_fraction=0.1,
    )
    return tmp


def test_single_shot_matches_oracle(small_wal):
    cfg = _cfg(small_wal)
    report = run_ingest(cfg)
    assert report.commits == 1
    assert report.events_applied == 400
    expected = _expected_lake(cfg.wal_dir)
    got = _snapshot_dict(cfg.lake_dir)
    assert got == expected  # byte-identical text per url included


def test_incremental_equals_single_shot(small_wal):
    """Full replay == incremental micro-batches (one segment per commit).
    This is the reference's watermark-per-file resume model
    (``dags:156-170``) upgraded to equality of final states."""
    cfg_inc = _cfg(small_wal, lake_dir=os.path.join(small_wal, "lake_inc"),
                   max_segments_per_batch=1)
    cfg_all = _cfg(small_wal, lake_dir=os.path.join(small_wal, "lake_all"))
    rep_inc = run_ingest(cfg_inc)
    rep_all = run_ingest(cfg_all)
    assert rep_inc.commits == 8 and rep_all.commits == 1
    assert _snapshot_dict(cfg_inc.lake_dir) == _snapshot_dict(cfg_all.lake_dir)


def test_noop_when_no_new_segments(small_wal):
    cfg = _cfg(small_wal)
    run_ingest(cfg)
    v1 = load_manifest(cfg.lake_dir).version
    report = run_ingest(cfg)  # watermark is strictly-greater: nothing new
    assert report.commits == 0
    assert load_manifest(cfg.lake_dir).version == v1


def test_duplicate_segment_delivery_is_noop(small_wal):
    """At-least-once upstream: re-delivering already-merged events must
    not change the lake (LWW idempotence)."""
    cfg = _cfg(small_wal, max_segments_per_batch=4)
    run_ingest(cfg)
    before = _snapshot_dict(cfg.lake_dir)
    # Re-deliver the first half of the WAL as fresh segments (new names
    # past the watermark, same payloads).
    segs = list_segments(cfg.wal_dir)
    for i, s in enumerate(segs[:4]):
        shutil.copy(s.path, os.path.join(cfg.wal_dir, f"segment-{100 + i:05d}.parquet"))
    run_ingest(cfg)
    assert _snapshot_dict(cfg.lake_dir) == before


def test_resume_after_kill_between_stage_and_commit(small_wal):
    """Simulate a crash after partition files were staged but before the
    manifest swap: the manifest still points at the old state, and a
    rerun converges to the correct final lake."""
    cfg = _cfg(small_wal, max_segments_per_batch=4)
    manifest_file = os.path.join(cfg.lake_dir, "_manifest.json")

    # First micro-batch committed normally.
    cfg_first = _cfg(small_wal, max_segments_per_batch=4)
    segs = list_segments(cfg.wal_dir)
    assert len(segs) == 8

    import data_hub_ejp_xml_pipeline_ray.pipelines.cdc as cdc_mod

    real_commit = cdc_mod.commit_manifest
    calls = {"n": 0}

    def crashing_commit(lake_dir, manifest, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before manifest swap")
        real_commit(lake_dir, manifest, **kwargs)

    cdc_mod.commit_manifest = crashing_commit
    try:
        with pytest.raises(RuntimeError):
            run_ingest(cfg_first)
    finally:
        cdc_mod.commit_manifest = real_commit

    # Crash happened: only batch 1 visible.
    m = load_manifest(cfg.lake_dir)
    assert m.version == 1 and m.watermark == segs[3].name

    # Rerun from checkpoint; converges to the oracle state.
    run_ingest(cfg)
    assert _snapshot_dict(cfg.lake_dir) == _expected_lake(cfg.wal_dir)
    assert os.path.exists(manifest_file)


def test_schema_evolution_v2_segments(tmp_path):
    """v2 segments add ``content_type`` and widen ``fetch_status`` to
    int64; v1-era rows are null-filled / widened in the final lake
    (reference schema-union semantics, ``bq_data_service.py:204-231``)."""
    tmp = str(tmp_path)
    generate_wal(
        os.path.join(tmp, "wal"),
        seed=5,
        n_urls=30,
        n_events=300,
        n_segments=6,
        v2_from_segment=3,
    )
    cfg = _cfg(tmp, max_segments_per_batch=2)  # v1-only commit, then mixed
    run_ingest(cfg)
    m = load_manifest(cfg.lake_dir)
    import pyarrow as pa

    assert m.schema.field("fetch_status").type == pa.int64()
    assert "content_type" in m.schema.names
    snap = lake_snapshot(cfg.lake_dir)
    assert snap.schema.field("fetch_status").type == pa.int64()
    # rows whose last write was v1 have null content_type
    by_version = {r["url"]: r for r in snap.to_pylist()}
    assert any(r["content_type"] is None for r in by_version.values())
    assert any(r["content_type"] is not None for r in by_version.values())
    # final state still matches the oracle on the shared columns
    assert _snapshot_dict(cfg.lake_dir) == _expected_lake(cfg.wal_dir)


def test_url_exclusion_filter(small_wal):
    cfg = _cfg(
        small_wal,
        lake_dir=os.path.join(small_wal, "lake_excl"),
        url_exclusion_pattern=r"https://site-1\.",
    )
    run_ingest(cfg)
    urls = lake_snapshot(cfg.lake_dir).column("url").to_pylist()
    assert urls, "exclusion must not drop everything"
    assert not any(u.startswith("https://site-1.") for u in urls)
    expected = {
        u: v
        for u, v in _expected_lake(cfg.wal_dir).items()
        if not u.startswith("https://site-1.")
    }
    assert _snapshot_dict(cfg.lake_dir) == expected


def test_hot_key_skew(tmp_path):
    """~2% of urls receive ~70% of events; correctness must hold (the
    combiner bounds per-key shuffle fan-in)."""
    tmp = str(tmp_path)
    generate_wal(
        os.path.join(tmp, "wal"),
        seed=23,
        n_urls=50,
        n_events=800,
        n_segments=4,
        hot_fraction=0.02,
        hot_mass=0.7,
        tie_fraction=0.15,
        delete_fraction=0.1,
    )
    cfg = _cfg(tmp, num_partitions=4)
    run_ingest(cfg)
    assert _snapshot_dict(cfg.lake_dir) == _expected_lake(cfg.wal_dir)


def test_read_lake_dataset(small_wal):
    cfg = _cfg(small_wal)
    run_ingest(cfg)
    ds = read_lake(cfg.lake_dir)
    n = ds.count()
    assert n == len(_expected_lake(cfg.wal_dir))
    assert "text" in ds.schema().names


def test_provenance_src_segment(small_wal):
    """Every lake row carries the segment that produced its winning
    event (M2 provenance analog, ``ejp_zip.py:66-69``)."""
    cfg = _cfg(small_wal, lake_dir=os.path.join(small_wal, "lake_prov"))
    run_ingest(cfg)
    snap = lake_snapshot(cfg.lake_dir)
    assert "_src_segment" in snap.column_names
    # winning event's segment per url, from the raw WAL (independent)
    segs = list_segments(cfg.wal_dir)
    best = {}
    for s in segs:
        for row in pq.read_table(s.path).to_pylist():
            key = (row["warc_ts"], row["seq"])
            cur = best.get(row["url"])
            if cur is None or key > cur[0]:
                best[row["url"]] = (key, s.name)
    for r in snap.to_pylist():
        assert r["_src_segment"] == best[r["url"]][1], r["url"]


def test_lookup_urls_point_read(small_wal):
    """Point lookup routes via crc32 to exactly the right partition
    files and agrees with the full snapshot, including delete handling."""
    from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import lookup_urls

    cfg = _cfg(small_wal, lake_dir=os.path.join(small_wal, "lake_lookup"))
    run_ingest(cfg)
    snap = {r["url"]: r for r in lake_snapshot(cfg.lake_dir).to_pylist()}
    live = sorted(snap)[:5]
    expected_all = _expected_lake(cfg.wal_dir)
    deleted = [u for u in expected_all for _ in [0]]  # all known urls
    missing = ["https://never-seen.example/x"]
    got = lookup_urls(cfg.lake_dir, live + missing)
    rows = {r["url"]: r for r in got.to_pylist()}
    assert sorted(rows) == live
    for u in live:
        assert rows[u]["text"] == snap[u]["text"]
        assert rows[u]["seq"] == snap[u]["seq"]


def test_partition_level_resume_skips_completed_merges(small_wal):
    """A retried micro-batch reuses already-written partition files
    (content-addressed path exists => complete result): files are not
    rewritten, and the final state still matches the oracle."""
    cfg = _cfg(small_wal, lake_dir=os.path.join(small_wal, "lake_resume2"))
    run_ingest(cfg)
    m = load_manifest(cfg.lake_dir)
    mtimes = {
        rel: os.path.getmtime(os.path.join(cfg.lake_dir, rel))
        for rel in m.partitions.values()
    }
    # simulate crash after phase 2 but before commit: manifest lost,
    # partition files present
    os.remove(os.path.join(cfg.lake_dir, "_manifest.json"))
    import time as _t
    _t.sleep(0.05)
    run_ingest(cfg)
    m2 = load_manifest(cfg.lake_dir)
    assert m2.partitions == m.partitions  # same content-addressed files
    for rel, old_mtime in mtimes.items():
        assert os.path.getmtime(os.path.join(cfg.lake_dir, rel)) == old_mtime, (
            f"{rel} was rewritten on resume"
        )
    assert _snapshot_dict(cfg.lake_dir) == _expected_lake(cfg.wal_dir)


def test_schema_evolution_across_batches_matches_single_shot(tmp_path, ray_session):
    """Column ORDER regression (found by a live kill/resume probe): a
    lake whose schema evolved mid-stream across micro-batch commits
    must be byte-identical — including column order — to a single-shot
    replay of the same WAL."""
    wal = str(tmp_path / "wal")
    generate_wal(wal, seed=31, n_urls=60, n_events=1500, n_segments=6,
                 v2_from_segment=3)
    inc = CdcConfig(wal_dir=wal, lake_dir=str(tmp_path / "inc"),
                    num_partitions=4, extract_concurrency=2,
                    max_segments_per_batch=2)
    one = CdcConfig(wal_dir=wal, lake_dir=str(tmp_path / "one"),
                    num_partitions=4, extract_concurrency=2,
                    max_segments_per_batch=64)
    run_ingest(inc)
    run_ingest(one)
    a = lake_snapshot(str(tmp_path / "inc")).sort_by([("url", "ascending")])
    b = lake_snapshot(str(tmp_path / "one")).sort_by([("url", "ascending")])
    assert a.schema.equals(b.schema)  # incl. column order
    assert a.equals(b)


def test_read_lake_column_pruning_across_evolution(tmp_path):
    """read_lake(columns=...) must return exactly the projection the
    full read would, including an evolution-added column that old
    partition files lack (scanner null-fills via the explicit schema)."""
    tmp = str(tmp_path)
    generate_wal(
        os.path.join(tmp, "wal"), seed=13, n_urls=30, n_events=300,
        n_segments=6, v2_from_segment=3,
    )
    cfg = _cfg(tmp, max_segments_per_batch=3)  # commit 1 = v1-only schema
    run_ingest(cfg)
    full = read_lake(cfg.lake_dir).to_pandas()
    pruned = read_lake(
        cfg.lake_dir, columns=["url", "content_type"]
    ).to_pandas()
    assert sorted(pruned.columns) == ["content_type", "url"]
    exp = full[["url", "content_type"]].sort_values("url", ignore_index=True)
    got = pruned[["url", "content_type"]].sort_values("url", ignore_index=True)
    assert got.equals(exp)
    assert pruned["content_type"].notna().any()  # evolved rows present


def test_read_lake_filter_pushdown(small_wal):
    """read_lake(filter=...) pushes the predicate into the parquet scan
    and composes with tombstone filtering (tombstones carry NULL
    payload, so a payload predicate cannot resurrect them)."""
    import pyarrow.compute as pc

    cfg = _cfg(small_wal)
    run_ingest(cfg)
    full = read_lake(cfg.lake_dir).to_pandas()
    en = read_lake(
        cfg.lake_dir, filter=(pc.field("lang") == "en")
    ).to_pandas()
    assert len(en) > 0
    exp = full[full["lang"] == "en"].sort_values("url", ignore_index=True)
    got = en.sort_values("url", ignore_index=True)
    assert got.equals(exp)
