"""Run-lock / concurrent-writer guard (T4): the engine's analog of the
reference's Airflow-Variable run lock (``dags/s3_xml_import_pipeline.py:
103-132``). Two concurrent writers on one lake must serialize: the
loser's commit is rejected (compare-and-swap on the manifest version)
and its staging is cleaned up — never an interleaved manifest swap."""
import json
import os
import time

import pytest

from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import (
    CdcConfig,
    _ingest_one_batch,
    run_ingest,
)
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal
from data_hub_ejp_xml_pipeline_ray.sources.wal import list_segments
from data_hub_ejp_xml_pipeline_ray.state.checkpoint import (
    LOCK_NAME,
    ConcurrentWriterError,
    LakeManifest,
    commit_manifest,
    load_manifest,
    writer_lock,
)


def test_lock_excludes_second_writer(tmp_path):
    lake = str(tmp_path / "lake")
    with writer_lock(lake):
        with pytest.raises(ConcurrentWriterError, match="locked by"):
            with writer_lock(lake):
                pass
    # released on exit: can acquire again
    with writer_lock(lake):
        pass
    assert not os.path.exists(os.path.join(lake, LOCK_NAME))


def test_stale_lock_is_broken(tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    with open(os.path.join(lake, LOCK_NAME), "w") as f:
        json.dump({"owner": "dead-writer", "expires_at": time.time() - 5}, f)
    with writer_lock(lake) as token:  # lease expired -> broken, not raised
        assert token != "dead-writer"


def test_release_does_not_remove_foreign_lock(tmp_path):
    """If a lease-breaker replaced our lock mid-run, exit must not
    delete the new owner's lock."""
    lake = str(tmp_path / "lake")
    lock_path = os.path.join(lake, LOCK_NAME)
    with writer_lock(lake):
        os.remove(lock_path)
        with open(lock_path, "w") as f:
            json.dump({"owner": "other", "expires_at": time.time() + 60}, f)
    with open(lock_path) as f:
        assert json.load(f)["owner"] == "other"


def test_commit_cas_rejects_stale_writer(tmp_path):
    lake = str(tmp_path / "lake")
    m1 = LakeManifest(num_partitions=4, version=1)
    commit_manifest(lake, m1, expected_version=0)
    m2 = LakeManifest(num_partitions=4, version=2)
    commit_manifest(lake, m2, expected_version=1)
    stale = LakeManifest(num_partitions=4, version=2)
    with pytest.raises(ConcurrentWriterError, match="concurrent writer"):
        commit_manifest(lake, stale, expected_version=1)
    assert load_manifest(lake).version == 2


def test_stale_ingest_batch_rejected_and_staging_cleaned(tmp_path, ray_session):
    """End-to-end: writer A loads the manifest, writer B commits first;
    A's batch must fail its commit and leave no staging files or
    manifest damage behind."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=7, n_urls=20, n_events=120, n_segments=4)
    cfg = CdcConfig(wal_dir=wal, lake_dir=lake, num_partitions=4,
                    extract_concurrency=2, max_segments_per_batch=2)

    # writer A ingests the first two segments and loads its state
    run_ingest(cfg)
    manifest_a = load_manifest(lake)

    # writer B lands new segments and commits first
    generate_wal(wal, seed=8, n_urls=20, n_events=60, n_segments=2,
                 start_segment=4)
    run_ingest(cfg)
    assert load_manifest(lake).version > manifest_a.version

    # writer A now tries to commit a batch against its stale snapshot
    generate_wal(wal, seed=9, n_urls=20, n_events=60, n_segments=1,
                 start_segment=6)
    segs = [s for s in list_segments(wal) if s.name > manifest_a.watermark]
    before = load_manifest(lake)
    with pytest.raises(ConcurrentWriterError):
        _ingest_one_batch(cfg, manifest_a, segs[:1])
    # staging cleaned, committed state untouched by the loser
    assert not os.path.isdir(os.path.join(lake, "_staging"))
    after = load_manifest(lake)
    assert after.version == before.version
    assert after.watermark == before.watermark
