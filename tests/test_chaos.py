"""External-kill chaos: SIGKILL a real CLI ingest subprocess mid-run.

The fault-injection crash tests (test_cdc_pipeline, test_store,
test_zones, test_mor) simulate crashes at chosen protocol points
INSIDE one process. Here the kill is a real ``SIGKILL`` delivered to a
separate OS process group from outside, triggered by observed commit
progress — so the process dies with whatever partial state it managed
to write (possibly mid-map, mid-stage-write, or inside the manifest
swap), exactly like a node loss on a cluster. The successor then has
to (a) break the dead writer's orphaned lease the way
``writer_lock``'s stale-break path would after the 120 s lease expiry
(the test rewrites ``expires_at`` into the past instead of sleeping),
and (b) resume from the committed watermark and converge to the
full-replay oracle bit-exactly.

Reference analog: the run-lock + watermark recovery semantics of
``dags/s3_xml_import_pipeline.py:103-170`` — a killed Airflow worker
leaves the state file at the last fully-processed object and the next
run continues from there.
"""
import json
import os
import signal
import subprocess
import sys
import time

from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import lake_snapshot
from data_hub_ejp_xml_pipeline_ray.pipelines.maintenance import fsck_lake
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal
from data_hub_ejp_xml_pipeline_ray.state.checkpoint import LOCK_NAME, load_manifest

from tests.test_cdc_pipeline import _expected_lake, _snapshot_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_ingest(wal: str, lake: str) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, "-m", "data_hub_ejp_xml_pipeline_ray.run",
         "ingest", "--wal-dir", wal, "--lake-dir", lake,
         "--num-partitions", "4", "--num-cpus", "4",
         "--max-segments-per-batch", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        start_new_session=True,  # own process group: the SIGKILL must
        # take the subprocess's local Ray daemons down with it, not
        # leave orphans chewing CPU under later tests
    )


def _kill_group(p: subprocess.Popen) -> None:
    try:
        os.killpg(p.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    p.wait(timeout=60)


def _kill_when_version_reaches(p: subprocess.Popen, lake: str,
                               target: int, timeout_s: float = 180.0) -> int:
    """Poll the committed manifest until ``version >= target`` (or the
    process exits on its own), then SIGKILL the whole group. Returns
    the version observed at kill time."""
    deadline = time.time() + timeout_s
    seen = 0
    while time.time() < deadline:
        if p.poll() is not None:  # finished before we could kill it
            m = load_manifest(lake)
            return m.version if m else 0
        m = load_manifest(lake)
        seen = m.version if m else 0
        if seen >= target:
            _kill_group(p)
            return seen
        time.sleep(0.1)
    _kill_group(p)
    raise AssertionError(
        f"ingest never reached version {target} within {timeout_s}s "
        f"(last seen {seen})")


def _expire_orphaned_lease(lake: str) -> bool:
    """A SIGKILLed writer leaves its lease lock behind. A successor on
    another node waits out the 120 s lease; the test compresses that
    wait by rewriting ``expires_at`` into the past — the successor's
    own ``_break_stale_lock`` path then runs for real."""
    path = os.path.join(lake, LOCK_NAME)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        return True  # torn lock write: stale-break handles it too
    doc["expires_at"] = 0.0
    tmp = path + ".expire"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)
    return True


def test_sigkill_mid_ingest_then_resume_converges(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=11, n_urls=60, n_events=2400, n_segments=8,
                 delete_fraction=0.15)

    # Kill #1: mid-run after >=2 of the 8 single-segment commits.
    p = _spawn_ingest(wal, lake)
    v1 = _kill_when_version_reaches(p, lake, 2)
    assert v1 >= 2
    had_lock_1 = _expire_orphaned_lease(lake)

    # Kill #2: the resumed run must itself survive being killed.
    p = _spawn_ingest(wal, lake)
    v2 = _kill_when_version_reaches(p, lake, max(v1 + 2, 5))
    assert v2 > v1, "resumed run made no progress before kill #2"
    had_lock_2 = _expire_orphaned_lease(lake)
    # The lease is held only around each commit window, so whether a
    # kill lands inside one is a genuine race — when it does, the
    # expiry above forces the successor through its stale-break path
    # (which test_runlock covers deterministically); either way the
    # resume must converge below.
    del had_lock_1, had_lock_2

    # Final run: completes the tail and exits cleanly.
    p = _spawn_ingest(wal, lake)
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()[-2000:]

    # Convergence: the crash-resumed lake equals the full-replay oracle.
    assert _snapshot_dict(lake) == _expected_lake(wal)

    # The committed chain is internally consistent despite two hard
    # kills: fsck finds no errors (staged debris from the killed runs
    # may legitimately surface as pre-GC warnings).
    report = fsck_lake(lake)
    assert report["ok"], report["errors"]

    # Watermark sits at the final segment: nothing left to ingest.
    m = load_manifest(lake)
    assert m.watermark == sorted(os.listdir(wal))[-1]
    snap = lake_snapshot(lake)
    assert snap.num_rows == len(_expected_lake(wal))
