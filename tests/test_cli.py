"""CLI driver smoke: ingest -> show -> compact via subprocess (its own
Ray session, separate from the test fixture's)."""
import json
import os
import subprocess
import sys

import pytest

from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "data_hub_ejp_xml_pipeline_ray.run", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_ingest_show_compact(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=2, n_urls=20, n_events=200, n_segments=2,
                 delete_fraction=0.2)
    r = _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
              "--num-partitions", "4", "--num-cpus", "4"])
    assert r["commits"] == 1 and r["events_applied"] == 200
    s = _run(["show", "--lake-dir", lake])
    assert s["committed"] and s["version"] == 1 and s["tombstones"] > 0
    c = _run(["compact", "--lake-dir", lake, "--num-cpus", "4"])
    assert c["tombstones_dropped"] == s["tombstones"]
    s2 = _run(["show", "--lake-dir", lake])
    assert s2["tombstones"] == 0 and s2["rows"] == s["rows"] - s["tombstones"]
    cl = _run(["cluster", "--lake-dir", lake, "--num-cpus", "4"])
    assert cl["sort_by"] == ["url"] and cl["partitions_rewritten"] > 0
    s3 = _run(["show", "--lake-dir", lake])
    assert s3["rows"] == s2["rows"]  # pure layout rewrite


def test_cli_split_and_errors(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=3, n_urls=30, n_events=200, n_segments=2)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    e = _run(["errors", "--lake-dir", lake])
    assert e["error_rows"] == 0
    sp = _run(["split", "--lake-dir", lake, "--part", "0", "--num-cpus", "4"])
    assert sp["parent"] == 0 and sp["modulus"] == 4
    s = _run(["show", "--lake-dir", lake])
    assert s["version"] == 2


def test_cli_poll_entity_routes_to_entity_lake(tmp_path):
    """poll --entity must ingest into the ENTITY lake (regression: it
    silently ran the page ingest)."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "elake")
    generate_wal(wal, seed=5, n_urls=10, n_events=60, n_segments=1,
                 rich_pages=True)
    r = _run(["poll", "--wal-dir", wal, "--lake-dir", lake,
              "--num-partitions", "4", "--num-cpus", "4",
              "--entity", "--interval", "0.5", "--timeout", "6"])
    assert r["commits"] == 1
    s = _run(["show", "--lake-dir", lake])
    # entity lake schema is the giveaway: entity_type discriminator
    assert "entity_type" in s["schema"]


def test_cli_versions_vacuum_changes(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=7, n_urls=25, n_events=240, n_segments=4,
                 delete_fraction=0.15)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4",
          "--max-segments-per-batch", "2"])
    v = _run(["versions", "--lake-dir", lake])
    assert [x["version"] for x in v["versions"]] == [1, 2]
    ch = _run(["changes", "--lake-dir", lake, "--from", "1", "--to", "2",
               "--num-cpus", "4"])
    assert ch["changes"] == sum(ch["by_op"].values())
    assert ch["changes"] > 0
    assert all(s["op"] in ("insert", "update", "delete") for s in ch["sample"])
    chp = _run(["changes", "--lake-dir", lake, "--from", "1", "--to", "2",
                "--preimages", "--num-cpus", "4"])
    assert set(chp["by_op"]) <= {
        "insert", "update_preimage", "update_postimage", "delete",
    }
    assert chp["by_op"].get("update_preimage") == chp["by_op"].get(
        "update_postimage"
    )
    view = str(tmp_path / "view")
    vw = _run(["view", "--lake-dir", lake, "--view-dir", view,
               "--num-cpus", "4"])
    assert vw["mode"] == "full" and sum(vw["view"].values()) > 0
    rep = str(tmp_path / "replica")
    sy = _run(["sync", "--lake-dir", lake, "--replica-dir", rep,
               "--num-cpus", "4"])
    assert sy["synced"] and sy["source_version"] == 2
    sy2 = _run(["sync", "--lake-dir", lake, "--replica-dir", rep,
                "--num-cpus", "4"])
    assert sy2 == {"synced": False, "mode": "noop", "source_version": 2}
    vac = _run(["vacuum", "--lake-dir", lake, "--keep", "1"])
    assert vac["retained_versions"] == [2]
    v2 = _run(["versions", "--lake-dir", lake])
    assert [x["version"] for x in v2["versions"]] == [2]


def test_cli_poll_keeps_consumers_fresh(tmp_path):
    """poll --view-dir/--replica-dir refreshes downstream consumers
    from the change feed after each commit (full on first sight,
    incremental thereafter)."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    rep = str(tmp_path / "rep")
    args = ["poll", "--wal-dir", wal, "--lake-dir", lake,
            "--num-partitions", "4", "--num-cpus", "4",
            "--interval", "0.5", "--timeout", "5",
            "--view-dir", view, "--replica-dir", rep]
    generate_wal(wal, seed=6, n_urls=12, n_events=80, n_segments=2)
    r1 = _run(args)
    assert r1["view"]["mode"] == "full" and r1["view"]["refreshed"]
    assert r1["replica"]["mode"] == "full" and r1["replica"]["synced"]
    generate_wal(wal, seed=7, n_urls=12, n_events=40, n_segments=1,
                 start_segment=2)
    r2 = _run(args)
    assert r2["view"]["mode"] == "incremental"
    assert r2["replica"]["mode"] == "incremental"


def test_cli_poll_keeps_dedup_index_fresh(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    sidx = str(tmp_path / "sidx")
    args = ["poll", "--wal-dir", wal, "--lake-dir", lake,
            "--num-partitions", "4", "--num-cpus", "4",
            "--interval", "0.5", "--timeout", "5",
            "--dedup-index-dir", idx, "--simhash-index-dir", sidx]
    generate_wal(wal, seed=16, n_urls=12, n_events=80, n_segments=2)
    r1 = _run(args)
    assert r1["dedup_index"]["mode"] == "full"
    assert r1["simhash_index"]["mode"] == "full"
    generate_wal(wal, seed=17, n_urls=12, n_events=40, n_segments=1,
                 start_segment=2)
    r2 = _run(args)
    assert r2["dedup_index"]["mode"] == "incremental"
    assert r2["simhash_index"]["mode"] == "incremental"


def test_cli_export_snapshot(tmp_path):
    """export writes the (time-traveled) live rows as plain parquet a
    downstream tool can read directly."""
    import pyarrow.dataset as pads

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=8, n_urls=15, n_events=120, n_segments=2,
                 delete_fraction=0.2)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4",
          "--max-segments-per-batch", "1"])
    out1 = str(tmp_path / "out_v1")
    e1 = _run(["export", "--lake-dir", lake, "--out-dir", out1,
               "--version", "1", "--columns", "url,lang", "--num-cpus", "4"])
    assert e1["exported"] and e1["version"] == 1 and e1["rows"] > 0
    t = pads.dataset(out1, format="parquet").to_table()
    assert sorted(t.column_names) == ["lang", "url"]
    out2 = str(tmp_path / "out_cur")
    e2 = _run(["export", "--lake-dir", lake, "--out-dir", out2,
               "--num-cpus", "4"])
    s = _run(["show", "--lake-dir", lake])
    assert e2["rows"] == s["rows"] - s["tombstones"]


def test_cli_export_refuses_nonempty_dir(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=9, n_urls=8, n_events=40, n_segments=1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "2", "--num-cpus", "4"])
    out = str(tmp_path / "out")
    _run(["export", "--lake-dir", lake, "--out-dir", out, "--num-cpus", "4"])
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, "-m", "data_hub_ejp_xml_pipeline_ray.run",
         "export", "--lake-dir", lake, "--out-dir", out, "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert p.returncode == 2
    assert "not empty" in p.stdout


def test_cli_poll_entity_rejects_row_consumers(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, "-m", "data_hub_ejp_xml_pipeline_ray.run",
         "poll", "--wal-dir", "w", "--lake-dir", "l", "--entity",
         "--view-dir", str(tmp_path / "v")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=60,
    )
    assert p.returncode == 2
    assert "row-lake consumers" in p.stderr


def test_cli_redrive_noop_on_clean_lake(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=4, n_urls=10, n_events=60, n_segments=1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4"])
    r = _run(["redrive", "--lake-dir", lake])
    assert r == {"redriven_rows": 0, "commits": 0, "still_bad": 0}


def test_cli_fsck(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=5, n_urls=20, n_events=200, n_segments=2)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    rep = _run(["fsck", "--lake-dir", lake, "--deep", "--num-cpus", "4"])
    assert rep["ok"] and rep["deep"]["partitions_scanned"] == 4
    # corrupt: remove one data file -> nonzero exit + error in report
    m = json.load(open(os.path.join(lake, "_manifest.json")))
    victim = sorted(m["partitions"].values())[0]
    os.remove(os.path.join(lake, victim))
    p = subprocess.run(
        [sys.executable, "-m", "data_hub_ejp_xml_pipeline_ray.run",
         "fsck", "--lake-dir", lake],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH=REPO), cwd=REPO, timeout=300,
    )
    assert p.returncode == 1
    rep2 = json.loads(p.stdout.strip().splitlines()[-1])
    assert any("missing data file" in e for e in rep2["errors"])


def test_parse_constraint_forms():
    from data_hub_ejp_xml_pipeline_ray.run import _parse_constraint

    assert _parse_constraint("fetch_status,<,600") == ["fetch_status", "<", 600]
    assert _parse_constraint("lang,not_null") == ["lang", "not_null"]
    assert _parse_constraint("lang,in,en|de") == ["lang", "in", ["en", "de"]]
    assert _parse_constraint("url,matches,^https://") == [
        "url", "matches", "^https://"
    ]
    assert _parse_constraint("value,>=,1.5") == ["value", ">=", 1.5]


def test_cli_poll_mor_with_auto_maintain(tmp_path):
    """The one-process operational loop: poll ingests in merge-on-read
    mode and --auto-maintain folds the delta files after each commit
    (max_delta_files defaults to 8, so a single 8-commit burst
    triggers the fold)."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=9, n_urls=12, n_events=160, n_segments=8,
                 delete_fraction=0.1)
    r = _run(["poll", "--wal-dir", wal, "--lake-dir", lake,
              "--num-partitions", "4", "--num-cpus", "4",
              "--merge-mode", "mor", "--max-segments-per-batch", "1",
              "--interval", "0.5", "--timeout", "5", "--auto-maintain"])
    assert r["commits"] == 8
    assert r["maintenance"]["deltas_folded"] is True
    s = _run(["show", "--lake-dir", lake])
    assert s["delta_files"] == 0  # folded back off the ingest path
    assert s["rows"] > 0


def test_cli_plan_and_constrained_export(tmp_path):
    """Scan planner through the CLI: `plan` (metadata-only, no ray
    session) reports the partitions a constrained read touches, and
    `export --constraint` writes exactly the matching rows."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from data_hub_ejp_xml_pipeline_ray.pipelines.cdc import lake_snapshot

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=13, n_urls=40, n_events=400, n_segments=2,
                 delete_fraction=0.1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "8", "--num-cpus", "4"])
    snap = lake_snapshot(lake)
    url = snap.column("url")[0].as_py()
    plan = _run(["plan", "--lake-dir", lake, "--constraint", f"url,==,{url}"])
    assert plan["parts_read"] == 1
    assert plan["skipped_by_routing"] == plan["parts_total"] - 1
    out = str(tmp_path / "export")
    e = _run(["export", "--lake-dir", lake, "--out-dir", out,
              "--num-cpus", "4", "--constraint", f"url,==,{url}",
              "--constraint", "seq,>=,1"])
    want = snap.filter(pc.equal(snap.column("url"), url))
    assert e["rows"] == want.num_rows == 1
    got = pads.dataset(out, format="parquet").to_table()
    assert got.column("url")[0].as_py() == url


def test_cli_history_export(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=29, n_urls=25, n_events=300, n_segments=4,
                 delete_fraction=0.15)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4",
          "--max-segments-per-batch", "2"])
    out = str(tmp_path / "hist")
    h = _run(["history", "--lake-dir", lake, "--out-dir", out,
              "--num-cpus", "4"])
    assert h["exported"] and h["rows"] >= h["current_rows"] > 0
    import duckdb

    cur = duckdb.sql(
        f"SELECT count(*) FROM '{out}/*.parquet' WHERE valid_to IS NULL"
    ).fetchone()[0]
    assert cur == h["current_rows"]


def test_cli_consume_ack_loop(tmp_path):
    """Consumer-group feed through the CLI: first consume delivers the
    0->head feed and acks; second is caught up; a new commit delivers
    only the delta; --no-ack peeks without advancing."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=37, n_urls=30, n_events=240, n_segments=4,
                 delete_fraction=0.1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    out1 = str(tmp_path / "b1")
    r1 = _run(["consume", "--lake-dir", lake, "--consumer", "wh",
               "--out-dir", out1, "--num-cpus", "4"])
    assert r1["from_version"] == 0 and r1["to_version"] == 1
    assert r1["acked"] and r1["rows"] > 0
    r2 = _run(["consume", "--lake-dir", lake, "--consumer", "wh",
               "--out-dir", str(tmp_path / "b2"), "--num-cpus", "4"])
    assert r2["caught_up"] is True
    # new data arrives -> only the delta is delivered
    generate_wal(wal, seed=38, n_urls=30, n_events=60, n_segments=1,
                 start_segment=4, delete_fraction=0.0)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    out3 = str(tmp_path / "b3")
    r3 = _run(["consume", "--lake-dir", lake, "--consumer", "wh",
               "--out-dir", out3, "--num-cpus", "4", "--no-ack"])
    assert r3["from_version"] == 1 and r3["to_version"] == 2
    assert r3["acked"] is False and 0 < r3["rows"] < r1["rows"]
    # peek did not advance: the same delta redelivers
    r4 = _run(["consume", "--lake-dir", lake, "--consumer", "wh",
               "--out-dir", str(tmp_path / "b4"), "--num-cpus", "4"])
    assert r4["rows"] == r3["rows"] and r4["acked"] is True


def test_cli_lag(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=43, n_urls=20, n_events=200, n_segments=4)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    r = _run(["lag", "--lake-dir", lake, "--wal-dir", wal])
    assert r["pending_segments"] == 0 and r["pending_events"] == 0
    generate_wal(wal, seed=44, n_urls=20, n_events=100, n_segments=2,
                 start_segment=4)
    r2 = _run(["lag", "--lake-dir", lake, "--wal-dir", wal])
    assert r2["pending_segments"] == 2 and r2["pending_events"] == 100
    assert r2["next_segment"] == "segment-00004.parquet"
    assert r2["pending_bytes"] > 0 and r2["watermark"] == "segment-00003.parquet"


def test_cli_branch_publish(tmp_path):
    """WAP over the CLI: branch -> ingest into the branch dir -> audit-
    gated publish -> main fast-forwarded, branch consumed."""
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_wal(wal, seed=61, n_urls=20, n_events=150, n_segments=2,
                 delete_fraction=0.1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--num-cpus", "4"])
    b = _run(["branch", "--lake-dir", lake, "--name", "stage"])
    assert b["branch"] == "stage" and b["forked_from_version"] == 1
    ls = _run(["branch", "--lake-dir", lake])
    assert ls["branches"] == ["stage"]
    generate_wal(wal, seed=62, n_urls=20, n_events=100, n_segments=2,
                 start_segment=2, delete_fraction=0.1)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", b["dir"],
          "--num-partitions", "4", "--num-cpus", "4"])
    s_main = _run(["show", "--lake-dir", lake])
    assert s_main["version"] == 1  # main untouched by the branch ingest
    p = _run(["publish", "--lake-dir", lake, "--name", "stage",
              "--constraint", "seq,>=,0", "--num-cpus", "4"])
    assert p["published"] == "stage" and p["new_version"] == 2
    s2 = _run(["show", "--lake-dir", lake])
    assert s2["version"] == 2 and s2["watermark"] == p["watermark"]
    assert _run(["branch", "--lake-dir", lake])["branches"] == []


def test_cli_dedup_index(tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    sidx = str(tmp_path / "sidx")
    generate_wal(wal, seed=9, n_urls=20, n_events=200, n_segments=4)
    _run(["ingest", "--wal-dir", wal, "--lake-dir", lake,
          "--num-partitions", "4", "--max-segments-per-batch", "2",
          "--num-cpus", "4"])
    r = _run(["dedup-index", "--lake-dir", lake, "--index-dir", idx,
              "--num-cpus", "4"])
    assert r["mode"] == "full" and "dup_groups" in r
    # second run with no new commits: noop, groups still reported
    r2 = _run(["dedup-index", "--lake-dir", lake, "--index-dir", idx,
               "--num-cpus", "4"])
    assert r2["mode"] == "noop" and r2["dup_groups"] == r["dup_groups"]
    s = _run(["dedup-index", "--lake-dir", lake, "--index-dir", sidx,
              "--simhash", "--num-cpus", "4"])
    assert s["mode"] == "full" and "cluster_rows" in s
