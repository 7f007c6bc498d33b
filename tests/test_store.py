"""Storage-seam design tests: the manifest commit protocol must be
safe WITHOUT POSIX rename (object-store deployment), and the local
primitives must keep their single-winner guarantees.

The fake store (`InMemoryCASStore`) has no rename primitive by
construction — every protocol run against it is proof the commit path
only needs conditional PUT semantics (S3 `If-None-Match: *` /
`If-Match: <etag>`). Reference analog: the S3-backed state object the
reference rewrites per file (`ejp_xml_pipeline/data_store/
s3_data_service.py:26-39`, `etl_state.py:14-23`)."""
import json
import threading

import pytest

from data_hub_ejp_xml_pipeline_ray.state.checkpoint import (
    ConcurrentWriterError,
    LakeManifest,
    commit_manifest,
    list_versions,
    load_manifest,
)
from data_hub_ejp_xml_pipeline_ray.state.store import (
    InjectedFault,
    InMemoryCASStore,
    LocalFsStore,
)

LAKE = "lake"  # opaque key prefix inside the fake store


def _manifest(version: int, wm: str, parts: dict[int, str]) -> LakeManifest:
    return LakeManifest(
        num_partitions=4, version=version, watermark=wm, partitions=parts
    )


def _commit_chain(store, n=3):
    for v in range(1, n + 1):
        commit_manifest(
            LAKE,
            _manifest(v, f"seg-{v}", {0: f"data/part-0-{v}.parquet"}),
            expected_version=v - 1,
            store=store,
        )


# ---------------------------------------------------------------------------
# rename-free commit protocol on the fake object store
# ---------------------------------------------------------------------------

def test_commit_chain_on_rename_free_store():
    store = InMemoryCASStore()
    _commit_chain(store, n=3)
    assert list_versions(LAKE, store=store) == [1, 2, 3]
    m = load_manifest(LAKE, store=store)
    assert m.version == 3 and m.watermark == "seg-3"
    # time travel reads the immutable snapshot, not the pointer
    assert load_manifest(LAKE, version=2, store=store).watermark == "seg-2"


def test_concurrent_writers_exactly_one_wins():
    store = InMemoryCASStore()
    _commit_chain(store, n=1)
    # both writers loaded v1 and race to commit DIFFERENT v2 content
    a = _manifest(2, "seg-2a", {0: "data/part-0-2a.parquet"})
    b = _manifest(2, "seg-2b", {0: "data/part-0-2b.parquet"})
    commit_manifest(LAKE, a, expected_version=1, store=store)
    with pytest.raises(ConcurrentWriterError):
        commit_manifest(LAKE, b, expected_version=1, store=store)
    assert load_manifest(LAKE, store=store).watermark == "seg-2a"


def test_crash_between_snapshot_and_pointer_then_retry():
    store = InMemoryCASStore()
    _commit_chain(store, n=1)
    m2 = _manifest(2, "seg-2", {0: "data/part-0-2.parquet"})
    # crash after the CAS snapshot put, before the pointer swap
    store.fail_after(1)
    with pytest.raises(InjectedFault):
        commit_manifest(LAKE, m2, expected_version=1, store=store)
    store.fail_after(None)
    # readers still see the OLD committed state (pointer untouched)
    assert load_manifest(LAKE, store=store).version == 1
    # the RETRIED commit (same deterministic content) completes both steps
    commit_manifest(LAKE, m2, expected_version=1, store=store)
    got = load_manifest(LAKE, store=store)
    assert got.version == 2 and got.watermark == "seg-2"
    assert list_versions(LAKE, store=store) == [1, 2]


def test_zombie_writer_cannot_regress_pointer():
    store = InMemoryCASStore()
    _commit_chain(store, n=1)
    # zombie A crashes mid-commit of v2; successor B (after A's lease
    # would have been broken) commits ITS OWN v2 first
    a = _manifest(2, "seg-2a", {0: "data/part-0-2a.parquet"})
    store.fail_after(1)
    with pytest.raises(InjectedFault):
        commit_manifest(LAKE, a, expected_version=1, store=store)
    store.fail_after(None)
    b = _manifest(2, "seg-2b", {0: "data/part-0-2b.parquet"})
    with pytest.raises(ConcurrentWriterError):
        # B finds A's orphan v2 snapshot with different content — the
        # CAS point reports the conflict instead of silently merging
        commit_manifest(LAKE, b, expected_version=1, store=store)
    # A wakes up and finishes: allowed — ITS snapshot is the v2 winner
    commit_manifest(LAKE, a, expected_version=1, store=store)
    assert load_manifest(LAKE, store=store).watermark == "seg-2a"
    # a LATE zombie holding stale pointer bytes cannot regress history:
    # C commits v3; A retries its v2 commit and must lose
    c = _manifest(3, "seg-3", {0: "data/part-0-3.parquet"})
    commit_manifest(LAKE, c, expected_version=2, store=store)
    with pytest.raises(ConcurrentWriterError):
        commit_manifest(LAKE, a, expected_version=1, store=store)
    assert load_manifest(LAKE, store=store).version == 3


def test_retry_refreshes_snapshot_to_pointer_bytes():
    # lineage timestamps may differ between attempt and retry; after the
    # retry the snapshot and pointer must hold the SAME bytes
    store = InMemoryCASStore()
    _commit_chain(store, n=1)
    m2 = _manifest(2, "seg-2", {0: "data/part-0-2.parquet"})
    m2.lineage = [{"version": 2, "committed_at": "2024-01-01T00:00:00Z"}]
    store.fail_after(1)
    with pytest.raises(InjectedFault):
        commit_manifest(LAKE, m2, expected_version=1, store=store)
    store.fail_after(None)
    retry = _manifest(2, "seg-2", {0: "data/part-0-2.parquet"})
    retry.lineage = [{"version": 2, "committed_at": "2024-01-01T00:05:00Z"}]
    commit_manifest(LAKE, retry, expected_version=1, store=store)
    snap = store.get_bytes(f"{LAKE}/_snapshots/v000002.json")
    pointer = store.get_bytes(f"{LAKE}/_manifest.json")
    assert snap == pointer
    assert json.loads(snap)["lineage"][0]["committed_at"].endswith("05:00Z")


# ---------------------------------------------------------------------------
# local primitives keep single-winner semantics
# ---------------------------------------------------------------------------

def test_local_put_if_absent_single_winner(tmp_path):
    store = LocalFsStore()
    path = str(tmp_path / "lock.json")
    wins = []
    barrier = threading.Barrier(8)

    def race(i):
        barrier.wait()
        if store.put_if_absent(path, f"w{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=race, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(wins) == 1
    assert store.get_bytes(path) == f"w{wins[0]}".encode()


def test_local_replace_if_matches_single_winner(tmp_path):
    store = LocalFsStore()
    path = str(tmp_path / "pointer.json")
    store.put_atomic(path, b"base")
    wins = []
    barrier = threading.Barrier(8)

    def race(i):
        barrier.wait()
        if store.replace_if_matches(path, b"base", f"w{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=race, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(wins) == 1
    assert store.get_bytes(path) == f"w{wins[0]}".encode()


def test_local_replace_if_matches_mismatch_restores(tmp_path):
    store = LocalFsStore()
    path = str(tmp_path / "pointer.json")
    store.put_atomic(path, b"current")
    assert store.replace_if_matches(path, b"stale", b"new") is False
    assert store.get_bytes(path) == b"current"  # restored, not lost


def test_local_commit_chain_matches_fake_store_protocol(tmp_path):
    # the SAME protocol runs on POSIX: chain + CAS rejection
    lake = str(tmp_path / "lake")
    for v in range(1, 3):
        commit_manifest(
            lake, _manifest(v, f"seg-{v}", {0: f"data/p{v}.parquet"}),
            expected_version=v - 1,
        )
    assert list_versions(lake) == [1, 2]
    with pytest.raises(ConcurrentWriterError):
        commit_manifest(
            lake, _manifest(2, "seg-2x", {0: "data/px.parquet"}),
            expected_version=1,
        )
    assert load_manifest(lake).watermark == "seg-2"
