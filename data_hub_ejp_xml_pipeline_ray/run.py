"""CLI driver — the ``ray job submit`` entry point.

The analog of the reference's DAG orchestration (sensor -> lock ->
etl -> load, ``dags/s3_xml_import_pipeline.py:249-306``) as a small
driver loop:

    python -m data_hub_ejp_xml_pipeline_ray.run ingest --wal-dir W --lake-dir L
    python -m data_hub_ejp_xml_pipeline_ray.run poll   --wal-dir W --lake-dir L --interval 5
    python -m data_hub_ejp_xml_pipeline_ray.run compact --lake-dir L
    python -m data_hub_ejp_xml_pipeline_ray.run show   --lake-dir L
    python -m data_hub_ejp_xml_pipeline_ray.run ingest --config job.json

This module OWNS the Ray session (guarded init + shutdown); library
code never does.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        ray.data.DataContext.get_current().enable_progress_bars = False


def _parse_constraint(spec: str) -> list:
    """``COL,OP[,VALUE]`` → the CdcConfig constraint triple. VALUE is
    int/float when numeric, ``|``-separated list for in/not_in, else a
    string (regex for ``matches``)."""
    parts = spec.split(",", 2)
    if len(parts) < 2:
        raise SystemExit(f"bad --constraint {spec!r}: need COL,OP[,VALUE]")
    col, op = parts[0].strip(), parts[1].strip()
    if len(parts) == 2:
        return [col, op]
    raw = parts[2]
    if op in ("in", "not_in"):
        return [col, op, [_coerce(v) for v in raw.split("|")]]
    return [col, op, _coerce(raw)]


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def _cfg_from_args(args) -> "CdcConfig":
    from .config import load_job_config
    from .pipelines.cdc import CdcConfig

    if args.config:
        doc = load_job_config(args.config, args.deployment_env)
        return CdcConfig(**doc)
    extra = {}
    if getattr(args, "segment_glob", None):
        extra["segment_glob"] = args.segment_glob
    if getattr(args, "include_pattern", None):
        extra["include_pattern"] = args.include_pattern
    if getattr(args, "constraint", None):
        extra["constraints"] = [_parse_constraint(c) for c in args.constraint]
    if getattr(args, "merge_mode", None):
        extra["merge_mode"] = args.merge_mode
    if getattr(args, "source", None):
        extra["source"] = args.source
    return CdcConfig(
        wal_dir=args.wal_dir,
        lake_dir=args.lake_dir,
        num_partitions=args.num_partitions,
        url_exclusion_pattern=args.exclude,
        max_segments_per_batch=args.max_segments_per_batch,
        **extra,
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_hub_ejp_xml_pipeline_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp, lake_only=False):
        sp.add_argument("--config", help="JSON job config ({ENV}-templated)")
        sp.add_argument("--deployment-env", default=None)
        sp.add_argument("--lake-dir")
        sp.add_argument("--num-cpus", type=int, default=None)
        if not lake_only:
            sp.add_argument("--wal-dir")
            sp.add_argument("--num-partitions", type=int, default=64)
            sp.add_argument("--exclude", default=None,
                            help="url exclusion regex")
            sp.add_argument("--max-segments-per-batch", type=int, default=64)
            sp.add_argument("--source", default=None,
                            help="named WAL source for multi-WAL fan-in: "
                                 "advances its own per-source watermark "
                                 "instead of the global tailer cursor")
            sp.add_argument("--segment-glob", default=None,
                            help="WAL segment glob (default segment-*.parquet; "
                                 "use segment-*.jsonl for a JSONL wire WAL, "
                                 "segment-* for mixed)")
            sp.add_argument("--include-pattern", default=None,
                            help="second fnmatch glob on segment names, "
                                 "ANDed with --segment-glob (positive "
                                 "keyspace slice, e.g. segment-2024*)")
            sp.add_argument("--constraint", action="append", default=None,
                            metavar="COL,OP[,VALUE]",
                            help="ingest-time CHECK constraint, repeatable "
                                 "(e.g. fetch_status,<,600  lang,not_null  "
                                 "lang,in,en|de|fr); violations quarantine "
                                 "to <lake>/_errors")
            sp.add_argument("--merge-mode", default=None,
                            choices=("cow", "mor"),
                            help="cow (default) rewrites touched partition "
                                 "bases per batch; mor appends immutable "
                                 "per-partition delta files (Hudi-MOR "
                                 "shape) — fold them with compact-deltas")
            sp.add_argument("--entity", action="store_true",
                            help="ingest into the demuxed entity lake "
                                 "(page/link/heading rows) instead of the page lake")

    sp = sub.add_parser("ingest", help="one tail->merge->commit pass")
    add_common(sp)
    sp = sub.add_parser("poll", help="sensor loop: ingest whenever new segments land")
    add_common(sp)
    sp.add_argument("--interval", type=float, default=5.0)
    sp.add_argument("--timeout", type=float, default=120.0,
                    help="stop after this long with no new data")
    sp.add_argument("--view-dir", default=None,
                    help="keep this materialized view refreshed from "
                         "the change feed after every commit")
    sp.add_argument("--replica-dir", default=None,
                    help="keep this replica table synced from the "
                         "change feed after every commit")
    sp.add_argument("--dedup-index-dir", default=None,
                    help="keep this exact-dedup index refreshed from "
                         "the change feed after every commit")
    sp.add_argument("--simhash-index-dir", default=None,
                    help="keep this SimHash near-dup index refreshed "
                         "from the change feed after every commit")
    sp.add_argument("--auto-maintain", action="store_true",
                    help="run the stat-driven maintenance policy "
                         "(delta fold / compact / split) after each "
                         "commit — the one-process operational loop")
    sp = sub.add_parser("compact", help="drop persisted tombstones")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "alter",
        help="metadata-only schema change: --add NAME:TYPE, "
             "--rename OLD:NEW, --drop NAME (repeatable; no data "
             "file is rewritten)")
    add_common(sp, lake_only=True)
    sp.add_argument("--add", action="append", default=[],
                    metavar="NAME:TYPE")
    sp.add_argument("--rename", action="append", default=[],
                    metavar="OLD:NEW")
    sp.add_argument("--drop", action="append", default=[], metavar="NAME")
    sp = sub.add_parser(
        "schema",
        help="print the lake schema (name, type, historical aliases); "
             "--version time-travels")
    add_common(sp, lake_only=True)
    sp.add_argument("--version", type=int, default=None)
    sp = sub.add_parser(
        "compact-deltas",
        help="fold pending merge-on-read delta files into partition "
             "bases (tombstones kept)")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "cluster", help="sort-cluster partition files for row-group pruning")
    add_common(sp, lake_only=True)
    sp.add_argument("--sort-by", default="url",
                    help="comma-separated sort key columns (default url)")
    sp.add_argument("--method", default="linear",
                    choices=["linear", "zorder"],
                    help="linear = lexicographic multi-key sort; zorder = "
                         "Morton-interleaved clustering (row-group stats "
                         "stay selective for EVERY key)")
    sp = sub.add_parser("show", help="print committed manifest summary")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "split", help="partition-count evolution: split one partition "
                      "or every partition over a byte threshold")
    add_common(sp, lake_only=True)
    sp.add_argument("--part", type=int, default=None,
                    help="partition residue to split")
    sp.add_argument("--max-partition-bytes", type=int, default=None,
                    help="split every partition larger than this")
    sp = sub.add_parser("errors", help="print quarantined dead-letter rows")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "maintain",
        help="stat-driven maintenance policy: compact over a tombstone "
             "ratio, split overflowing partitions, optional vacuum")
    add_common(sp, lake_only=True)
    sp.add_argument("--tombstone-ratio", type=float, default=0.2)
    sp.add_argument("--max-partition-bytes", type=int, default=1 << 30)
    sp.add_argument("--vacuum-keep", type=int, default=None)
    sp = sub.add_parser(
        "fsck",
        help="read-only lake integrity audit: manifest/snapshot chain, "
             "data-file existence + stat drift, partition-map covering; "
             "--deep re-reads every partition (counts + url routing)")
    add_common(sp, lake_only=True)
    sp.add_argument("--deep", action="store_true")
    sp = sub.add_parser(
        "rewind",
        help="move the tailer watermark BACKWARD for a controlled "
             "backfill (LWW replay converges); forward moves refused")
    add_common(sp, lake_only=True)
    sp.add_argument("--to", default=None,
                    help="segment name to rewind to (omit = beginning)")
    sp = sub.add_parser(
        "redrive",
        help="replay quarantined rows through the normal ingest path "
             "(plain retry; pass a fixer via the redrive_errors API)")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "versions", help="list retained snapshot versions (time travel)")
    add_common(sp, lake_only=True)
    sp = sub.add_parser(
        "tag", help="pin/list/delete named version tags (tagged "
                    "versions survive retention and vacuum)")
    add_common(sp, lake_only=True)
    sp.add_argument("--name", default=None,
                    help="tag to create (omit to list tags)")
    sp.add_argument("--version", type=int, default=None,
                    help="version to pin (default: current)")
    sp.add_argument("--delete", action="store_true",
                    help="delete --name instead of creating it")
    sp = sub.add_parser(
        "vacuum", help="prune version history to the newest K snapshots")
    add_common(sp, lake_only=True)
    sp.add_argument("--keep", type=int, default=1)
    sp = sub.add_parser(
        "purge",
        help="right-to-be-forgotten: scrub url(s) from the live "
             "snapshot AND all retained history, and register them so "
             "a replayed WAL range cannot resurrect them")
    add_common(sp, lake_only=True)
    sp.add_argument("--url", action="append", required=True,
                    help="url to purge (repeatable)")
    sp = sub.add_parser(
        "changes", help="change feed between two retained versions")
    add_common(sp, lake_only=True)
    sp.add_argument("--from", dest="v_from", type=int, required=True)
    sp.add_argument("--to", dest="v_to", type=int, default=None)
    sp.add_argument("--limit", type=int, default=10,
                    help="sample (url, op) pairs to include")
    sp.add_argument("--preimages", action="store_true",
                    help="Delta-CDF retraction rows (update_preimage/"
                         "update_postimage; deletes carry the old row)")
    sp = sub.add_parser(
        "view", help="refresh + print an incrementally-maintained "
                     "live-count materialized view")
    add_common(sp, lake_only=True)
    sp.add_argument("--view-dir", required=True)
    sp.add_argument("--key", default="lang")
    sp.add_argument("--at-version", type=int, default=None)
    sp = sub.add_parser(
        "sync", help="sync a feed-driven replica table of the lake")
    add_common(sp, lake_only=True)
    sp.add_argument("--replica-dir", required=True)
    sp.add_argument("--columns", default=None,
                    help="comma-separated payload columns to replicate")
    sp = sub.add_parser(
        "export", help="write a (time-traveled) snapshot of the live "
                       "rows as a plain parquet directory")
    add_common(sp, lake_only=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--tag", default=None,
                    help="named tag: export the version it pins")
    sp.add_argument("--timestamp", default=None,
                    help="ISO instant: export the version current then")
    sp.add_argument("--columns", default=None,
                    help="comma-separated columns to export")
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    help="read predicate (repeatable, ANDed): drives "
                         "the zone-map/hash-routing scan planner and "
                         "filters the exported rows")
    sp = sub.add_parser(
        "history", help="export the SCD2 (type-2) interval history of "
                        "the retained version chain as parquet")
    add_common(sp, lake_only=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--to-version", type=int, default=None,
                    help="truncate history at this version")
    sp = sub.add_parser(
        "clone", help="deep-clone a committed snapshot into a fresh "
                      "independent lake (carries schema/partitions/"
                      "watermark; tailing resumes on the clone)")
    add_common(sp, lake_only=True)
    sp.add_argument("--dst-dir", required=True)
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--tag", default=None,
                    help="named tag: clone the version it pins")
    sp = sub.add_parser(
        "restore", help="roll the lake head back to a retained snapshot "
                        "(new commit, no data copy; the watermark "
                        "carries back so ingest replays)")
    add_common(sp, lake_only=True)
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--tag", default=None,
                    help="named tag: restore the version it pins")
    sp = sub.add_parser(
        "lag", help="tail backlog behind the committed watermark "
                    "(pending segments/bytes/events) — metadata only")
    add_common(sp, lake_only=True)
    sp.add_argument("--wal-dir", required=True)
    sp.add_argument("--segment-glob", default=None)
    sp.add_argument("--source", dest="lag_source", default=None,
                    help="report this named source's cursor lag "
                         "(multi-WAL fan-in lakes)")
    sp = sub.add_parser(
        "wal-gc", help="retire WAL segments every consumer lake has "
                       "durably passed (binlog purge; metadata-only; "
                       "--archive-dir moves instead of deleting)")
    sp.add_argument("--wal-dir", required=True)
    sp.add_argument("--lake-dir", action="append", required=True,
                    dest="lake_dirs",
                    help="repeatable: EVERY lake tailing this WAL; "
                         "append ::SOURCE for a multi-WAL fan-in "
                         "lake's per-source cursor")
    sp.add_argument("--keep-last", type=int, default=2)
    sp.add_argument("--archive-dir", default=None)
    sp.add_argument("--dry-run", action="store_true")
    sp = sub.add_parser(
        "consume", help="consumer-group change-feed read: write the "
                        "feed since this consumer's cursor as parquet, "
                        "ack on success (at-least-once delivery, "
                        "exactly-once cursor advance)")
    add_common(sp, lake_only=True)
    sp.add_argument("--consumer", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--preimages", action="store_true")
    sp.add_argument("--no-ack", action="store_true",
                    help="peek: read without advancing the cursor")
    sp = sub.add_parser(
        "branch", help="write-audit-publish branches: fork a zero-copy "
                       "staging ref off the lake head (ingest/compact "
                       "against <lake>/_branches/<name>), list, or "
                       "delete one")
    add_common(sp, lake_only=True)
    sp.add_argument("--name", default=None,
                    help="branch to create (omit to list branches)")
    sp.add_argument("--version", type=int, default=None,
                    help="fork point (default: current head)")
    sp.add_argument("--delete", action="store_true",
                    help="delete --name instead of creating it")
    sp = sub.add_parser(
        "publish", help="fast-forward the lake head to a branch "
                        "(optionally gated on CHECK-constraint audit "
                        "of the branch snapshot)")
    add_common(sp, lake_only=True)
    sp.add_argument("--name", required=True)
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    help="audit gate (repeatable, ANDed): refuse the "
                         "publish if any branch row violates")
    sp.add_argument("--keep-branch", action="store_true")
    sp = sub.add_parser(
        "merge", help="three-way LWW merge of a branch onto a main "
                      "that advanced past the fork (the case publish "
                      "refuses); (warc_ts, seq) decides conflicts")
    add_common(sp, lake_only=True)
    sp.add_argument("--name", required=True)
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    help="audit gate (repeatable, ANDed)")
    sp.add_argument("--keep-branch", action="store_true")
    sp = sub.add_parser(
        "delete-where",
        help="DELETE FROM lake WHERE ... — row-level predicate delete "
             "committed as one ordinary LWW version (feeds see plain "
             "deletes; history keeps the old rows, unlike purge)")
    add_common(sp, lake_only=True)
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    required=True, help="the WHERE predicate "
                    "(repeatable, ANDed)")
    sp = sub.add_parser(
        "update-where",
        help="UPDATE lake SET col=value ... WHERE ... — row-level "
             "predicate update committed as one ordinary LWW version")
    add_common(sp, lake_only=True)
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    required=True)
    sp.add_argument("--set", action="append", default=[],
                    dest="sets", metavar="COL=VALUE", required=True,
                    help="SET assignment (repeatable); VALUE is "
                    "JSON-decoded when possible, else a string")
    sp = sub.add_parser(
        "bloom-index",
        help="build / refresh the per-file bloom index for "
             "equality-predicate scan pruning on high-cardinality "
             "payload columns (new files indexed incrementally; a "
             "missing entry only costs pruning, never correctness)")
    add_common(sp, lake_only=True)
    sp.add_argument("--col", action="append", default=[], dest="cols",
                    metavar="COL", help="column to index (repeatable; "
                    "omit to refresh the stored column list)")
    sp = sub.add_parser(
        "dedup-index",
        help="build / incrementally refresh the maintained exact-dedup "
             "index from the change feed, then print duplicate-group "
             "stats (O(changed rows) after the first build)")
    add_common(sp, lake_only=True)
    sp.add_argument("--index-dir", required=True)
    sp.add_argument("--key-col", default="text")
    sp.add_argument("--simhash", action="store_true",
                    help="maintain the SimHash band index (near-dup "
                    "clusters) instead of the exact key index")
    sp.add_argument("--max-hamming", type=int, default=3)
    sp.add_argument("--fsck", action="store_true",
                    help="audit the index dir instead of refreshing "
                         "(state/file agreement; nonzero exit on "
                         "missing or empty referenced buckets)")
    sp = sub.add_parser(
        "plan", help="show the scan plan a constrained read would "
                     "execute (partitions/files touched vs skipped) — "
                     "metadata only, no data read")
    add_common(sp, lake_only=True)
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--constraint", action="append", default=[],
                    dest="constraints", metavar="COL,OP[,VALUE]",
                    required=True)

    args = p.parse_args(argv)

    if (
        args.cmd == "poll" and getattr(args, "entity", False)
        and (args.view_dir or args.replica_dir)
    ):
        # group-valued lakes need the entity feed; the row-level
        # consumers would mis-diff — refuse up front
        p.error("--view-dir/--replica-dir are row-lake consumers; "
                "they cannot ride --entity (group-valued) lakes")

    if args.cmd == "alter":  # metadata-only: no Ray session needed
        from .pipelines.ddl import alter_lake

        def _split1(s: str, what: str) -> tuple[str, str]:
            if ":" not in s:
                raise SystemExit(f"--{what} wants X:Y, got {s!r}")
            a, _, b = s.partition(":")
            return a, b

        print(json.dumps(alter_lake(
            args.lake_dir,
            add=dict(_split1(s, "add") for s in args.add),
            rename=dict(_split1(s, "rename") for s in args.rename),
            drop=list(args.drop),
        )))
        return 0
    if args.cmd == "schema":
        from .pipelines.ddl import schema_at

        print(json.dumps(schema_at(args.lake_dir, version=args.version)))
        return 0
    if args.cmd == "errors":
        from .pipelines.cdc import read_errors

        errs = read_errors(args.lake_dir)
        print(json.dumps({
            "lake": args.lake_dir, "error_rows": errs.num_rows,
            "by_error": {
                k: errs.column("error").to_pylist().count(k)
                for k in set(errs.column("error").to_pylist())
            },
        }))
        return 0
    if args.cmd == "maintain":
        from .pipelines.maintenance import auto_maintain

        print(json.dumps(auto_maintain(
            args.lake_dir,
            tombstone_ratio=args.tombstone_ratio,
            max_partition_bytes=args.max_partition_bytes,
            vacuum_keep=args.vacuum_keep,
        )))
        return 0
    if args.cmd == "rewind":
        from .pipelines.maintenance import rewind_watermark

        print(json.dumps(rewind_watermark(args.lake_dir, args.to)))
        return 0
    if args.cmd == "redrive":
        from .pipelines.cdc import CdcConfig, redrive_errors

        # partition count / wal_dir are unused: the redrive replays its
        # synthetic segments against the manifest's own partitioning
        cfg = CdcConfig(wal_dir="", lake_dir=args.lake_dir)
        print(json.dumps(redrive_errors(cfg)))
        return 0
    if args.cmd == "tag":
        from .state.checkpoint import delete_tag, list_tags, tag_version

        if args.name is None:
            print(json.dumps({"lake": args.lake_dir,
                              "tags": list_tags(args.lake_dir)}))
        elif args.delete:
            removed = delete_tag(args.lake_dir, args.name)
            print(json.dumps({"deleted": args.name, "existed": removed}))
        else:
            v = tag_version(args.lake_dir, args.name, args.version)
            print(json.dumps({"tag": args.name, "version": v}))
        return 0
    if args.cmd == "versions":
        from .state.checkpoint import (
            list_tags,
            list_versions,
            load_manifest,
            version_committed_at,
        )

        out = []
        for v in list_versions(args.lake_dir):
            m = load_manifest(args.lake_dir, version=v)
            out.append({
                "version": v, "watermark": m.watermark,
                "committed_at": version_committed_at(m),
                "partitions": len(m.all_parts()),
                "rows": sum(x.get("rows", 0) + x.get("delta_rows", 0)
                            for x in m.partition_meta.values()),
            })
        print(json.dumps({"lake": args.lake_dir, "versions": out,
                          "tags": list_tags(args.lake_dir)}))
        return 0
    if args.cmd == "branch":
        from .pipelines.branching import (
            create_branch, delete_branch, list_branches,
        )

        if args.name is None:
            print(json.dumps({"lake": args.lake_dir,
                              "branches": list_branches(args.lake_dir)}))
        elif args.delete:
            print(json.dumps(delete_branch(args.lake_dir, args.name)))
        else:
            print(json.dumps(create_branch(
                args.lake_dir, args.name, version=args.version)))
        return 0
    if args.cmd == "publish":
        from .pipelines.branching import publish_branch

        if args.constraints:
            _init_ray(args.num_cpus)  # the audit gate scans the branch
        print(json.dumps(publish_branch(
            args.lake_dir, args.name,
            audit_constraints=(
                [_parse_constraint(c) for c in args.constraints]
                if args.constraints else None
            ),
            keep_branch=args.keep_branch,
        )))
        return 0
    if args.cmd == "merge":
        from .pipelines.branching import merge_branch

        _init_ray(args.num_cpus)  # partition merges run as ray tasks
        print(json.dumps(merge_branch(
            args.lake_dir, args.name,
            audit_constraints=(
                [_parse_constraint(c) for c in args.constraints]
                if args.constraints else None
            ),
            keep_branch=args.keep_branch,
        )))
        return 0
    if args.cmd == "vacuum":
        from .pipelines.maintenance import vacuum

        print(json.dumps(vacuum(args.lake_dir, keep=args.keep)))
        return 0
    if args.cmd == "show":
        from .state.checkpoint import load_manifest

        m = load_manifest(args.lake_dir)
        if m is None:
            print(json.dumps({"lake": args.lake_dir, "committed": False}))
            return 1
        print(json.dumps({
            "lake": args.lake_dir, "committed": True, "version": m.version,
            "watermark": m.watermark, "partitions": len(m.all_parts()),
            # physical rows: base + pending MOR delta rows (upper bound
            # on live rows — supersessions/tombstones fold at read)
            "rows": sum(v.get("rows", 0) + v.get("delta_rows", 0)
                        for v in m.partition_meta.values()),
            "tombstones": sum(v.get("tombstones", 0) + v.get("delta_tombstones", 0)
                              for v in m.partition_meta.values()),
            "delta_files": sum(len(v) for v in m.delta_files.values()),
            "counters": m.counters,
            "schema": None if m.schema is None else m.schema.names,
        }))
        return 0

    if args.cmd == "clone":
        # pure file copy + manifest commit: no ray session
        from .pipelines.maintenance import clone_lake

        version = args.version
        if version is None and getattr(args, "tag", None):
            from .state.checkpoint import resolve_tag

            version = resolve_tag(args.lake_dir, args.tag)
        print(json.dumps(clone_lake(
            args.lake_dir, args.dst_dir, version=version,
        )))
        return 0

    if args.cmd == "restore":
        # manifest-only rollback: no ray session
        from .pipelines.maintenance import restore_lake

        version = args.version
        if version is None and getattr(args, "tag", None):
            from .state.checkpoint import resolve_tag

            version = resolve_tag(args.lake_dir, args.tag)
        if version is None:
            p.error("restore needs --version or --tag")
        print(json.dumps(restore_lake(args.lake_dir, version)))
        return 0

    if args.cmd == "lag":
        # metadata-only (listing + pending parquet footers): no ray
        from .pipelines.cdc import wal_lag

        print(json.dumps(wal_lag(
            args.lake_dir, args.wal_dir,
            segment_glob=getattr(args, "segment_glob", None),
            source=getattr(args, "lag_source", None),
        )))
        return 0

    if args.cmd == "wal-gc":
        # metadata-only (listing + one manifest JSON per consumer): no ray
        from .sources.wal import wal_gc

        consumers = [
            tuple(d.split("::", 1)) if "::" in d else d
            for d in args.lake_dirs
        ]
        print(json.dumps(wal_gc(
            args.wal_dir, consumers, keep_last=args.keep_last,
            archive_dir=args.archive_dir, dry_run=args.dry_run,
        )))
        return 0

    if args.cmd == "plan":
        # metadata-only (manifest zones + hash routing): no ray session
        from .pipelines.cdc import scan_plan

        print(json.dumps(scan_plan(
            args.lake_dir,
            [_parse_constraint(c) for c in args.constraints],
            version=args.version,
        )))
        return 0

    _init_ray(args.num_cpus)
    try:
        if args.cmd == "ingest":
            from .pipelines.cdc import run_entity_ingest, run_ingest

            runner = run_entity_ingest if getattr(args, "entity", False) else run_ingest
            report = runner(_cfg_from_args(args))
            print(json.dumps({
                "commits": report.commits,
                "events_applied": report.events_applied,
                "watermark": report.watermark,
                "version": report.final_version,
            }))
        elif args.cmd == "poll":
            from .pipelines.cdc import run_entity_ingest, run_ingest
            from .sources.wal import list_segments, segments_after
            from .state.checkpoint import load_manifest

            runner = (
                run_entity_ingest if getattr(args, "entity", False) else run_ingest
            )
            cfg = _cfg_from_args(args)
            deadline = time.monotonic() + args.timeout
            while time.monotonic() < deadline:
                m = load_manifest(cfg.lake_dir)
                # a named source polls ITS cursor — the global
                # watermark stays None for fan-in lakes, and reading it
                # here would see every segment as fresh forever (the
                # deadline would never lapse)
                wm = None if m is None else (
                    m.source_watermarks.get(cfg.source)
                    if cfg.source else m.watermark
                )
                fresh = segments_after(
                    list_segments(
                        cfg.wal_dir, cfg.segment_glob,
                        include_pattern=cfg.include_pattern,
                    ),
                    wm,
                )
                if fresh:
                    report = runner(cfg)
                    out = {
                        "commits": report.commits,
                        "events_applied": report.events_applied,
                        "watermark": report.watermark,
                    }
                    # downstream consumers ride the change feed — each
                    # refresh costs O(this batch's changes), not O(lake)
                    if getattr(args, "view_dir", None):
                        from .pipelines.incremental import (
                            refresh_live_counts,
                        )

                        out["view"] = refresh_live_counts(
                            cfg.lake_dir, args.view_dir
                        )
                    if getattr(args, "replica_dir", None):
                        from .pipelines.replicate import sync_replica

                        out["replica"] = sync_replica(
                            cfg.lake_dir, args.replica_dir
                        )
                    if getattr(args, "dedup_index_dir", None):
                        from .pipelines.dedup_index import (
                            refresh_dedup_index,
                        )

                        out["dedup_index"] = refresh_dedup_index(
                            cfg.lake_dir, args.dedup_index_dir
                        )
                    if getattr(args, "simhash_index_dir", None):
                        from .pipelines.dedup_index import (
                            refresh_simhash_index,
                        )

                        out["simhash_index"] = refresh_simhash_index(
                            cfg.lake_dir, args.simhash_index_dir
                        )
                    if getattr(args, "auto_maintain", False):
                        from .pipelines.maintenance import auto_maintain

                        out["maintenance"] = auto_maintain(cfg.lake_dir)
                    print(json.dumps(out), flush=True)
                    deadline = time.monotonic() + args.timeout
                else:
                    time.sleep(args.interval)
        elif args.cmd == "changes":
            from .pipelines.cdc import changes_between

            ds = changes_between(
                args.lake_dir, args.v_from, args.v_to,
                preimages=args.preimages,
            ).materialize()  # consumed twice below: diff runs ONCE
            ops = {
                r["change_op"]: r["count()"]
                for r in ds.groupby("change_op").count().take_all()
            }
            sample = [
                {"url": r["url"], "op": r["change_op"]}
                for r in ds.limit(args.limit).take(args.limit)
            ] if args.limit else []
            print(json.dumps({
                "lake": args.lake_dir, "from": args.v_from, "to": args.v_to,
                "changes": sum(ops.values()), "by_op": ops, "sample": sample,
            }))
        elif args.cmd == "view":
            from .pipelines.incremental import read_view, refresh_live_counts

            r = refresh_live_counts(
                args.lake_dir, args.view_dir, args.key,
                at_version=args.at_version,
            )
            table = read_view(args.view_dir)
            print(json.dumps({
                **r,
                "view": {
                    str(k): int(n) for k, n in zip(
                        table.column(args.key).to_pylist(),
                        table.column("n").to_pylist(),
                    )
                },
            }))
        elif args.cmd == "export":
            from .pipelines.cdc import read_lake
            from .state.checkpoint import resolve_version_at

            if os.path.isdir(args.out_dir) and os.listdir(args.out_dir):
                print(json.dumps({
                    "error": f"out-dir {args.out_dir} is not empty — "
                             "refusing to mix exports",
                }))
                return 2
            version = args.version
            if version is None and getattr(args, "tag", None):
                from .state.checkpoint import resolve_tag

                version = resolve_tag(args.lake_dir, args.tag)
            if version is None and args.timestamp is not None:
                version = resolve_version_at(args.lake_dir, args.timestamp)
            ds = read_lake(
                args.lake_dir, version=version,
                columns=(
                    args.columns.split(",") if args.columns else None
                ),
                constraints=(
                    [_parse_constraint(c) for c in args.constraints]
                    if getattr(args, "constraints", None) else None
                ),
            )
            ds.write_parquet(args.out_dir)
            import pyarrow.dataset as pads

            n = pads.dataset(args.out_dir, format="parquet").count_rows()
            print(json.dumps({
                "exported": True, "out_dir": args.out_dir,
                "version": version, "rows": n,
            }))
        elif args.cmd == "history":
            from .pipelines.cdc import scd2_history

            if os.path.isdir(args.out_dir) and os.listdir(args.out_dir):
                print(json.dumps({
                    "error": f"out-dir {args.out_dir} is not empty — "
                             "refusing to mix exports",
                }))
                return 2
            ds = scd2_history(args.lake_dir, to_version=args.to_version)
            ds.write_parquet(args.out_dir)
            import pyarrow.dataset as pads

            d = pads.dataset(args.out_dir, format="parquet")
            print(json.dumps({
                "exported": True, "out_dir": args.out_dir,
                "rows": d.count_rows(),
                "current_rows": d.count_rows(
                    filter=pads.field("valid_to").is_null()
                ),
            }))
        elif args.cmd == "consume":
            from .pipelines.cdc import ack_changes, next_changes

            if os.path.isdir(args.out_dir) and os.listdir(args.out_dir):
                print(json.dumps({
                    "error": f"out-dir {args.out_dir} is not empty — "
                             "refusing to mix feed batches",
                }))
                return 2
            ds, token = next_changes(
                args.lake_dir, args.consumer, preimages=args.preimages,
            )
            if ds is None:
                print(json.dumps({**token, "caught_up": True}))
            else:
                ds.write_parquet(args.out_dir)
                import pyarrow.dataset as pads

                n = pads.dataset(args.out_dir, format="parquet").count_rows()
                acked = (
                    False if args.no_ack
                    else ack_changes(args.lake_dir, token)
                )
                print(json.dumps({
                    **token, "caught_up": False, "rows": n,
                    "out_dir": args.out_dir, "acked": acked,
                }))
        elif args.cmd == "sync":
            from .pipelines.replicate import sync_replica

            print(json.dumps(sync_replica(
                args.lake_dir, args.replica_dir,
                columns=(
                    args.columns.split(",") if args.columns else None
                ),
            )))
        elif args.cmd == "fsck":
            from .pipelines.maintenance import fsck_lake

            report = fsck_lake(args.lake_dir, deep=args.deep)
            print(json.dumps(report))
            if not report["ok"]:
                return 1
        elif args.cmd == "compact":
            from .pipelines.maintenance import compact_lake

            print(json.dumps(compact_lake(args.lake_dir)))
        elif args.cmd == "purge":
            from .pipelines.maintenance import purge_urls

            print(json.dumps(purge_urls(args.lake_dir, args.url)))
        elif args.cmd == "bloom-index":
            from .state.bloomindex import build_bloom_index

            print(json.dumps(build_bloom_index(
                args.lake_dir, args.cols or None
            )))
        elif args.cmd == "dedup-index":
            if getattr(args, "fsck", False):
                from .pipelines.dedup_index import fsck_index

                rep = fsck_index(args.index_dir)
                print(json.dumps(rep))
                return 0 if rep["ok"] else 3
            if args.simhash:
                from .pipelines.dedup_index import (
                    near_dup_clusters,
                    refresh_simhash_index,
                )

                res = refresh_simhash_index(
                    args.lake_dir, args.index_dir, key_col=args.key_col
                )
                res["cluster_rows"] = near_dup_clusters(
                    args.index_dir, max_hamming=args.max_hamming
                ).count()
            else:
                from .pipelines.dedup_index import (
                    dup_groups,
                    refresh_dedup_index,
                )

                res = refresh_dedup_index(
                    args.lake_dir, args.index_dir, key_col=args.key_col
                )
                res["dup_groups"] = dup_groups(args.index_dir).count()
            print(json.dumps(res))
        elif args.cmd == "delete-where":
            from .pipelines.dml import delete_where

            print(json.dumps(delete_where(
                args.lake_dir,
                [_parse_constraint(c) for c in args.constraints],
            )))
        elif args.cmd == "update-where":
            from .pipelines.dml import update_where

            set_values = {}
            for spec in args.sets:
                col, _, raw = spec.partition("=")
                if not _:
                    raise SystemExit(f"bad --set {spec!r}: need COL=VALUE")
                try:
                    set_values[col] = json.loads(raw)
                except json.JSONDecodeError:
                    set_values[col] = raw
            print(json.dumps(update_where(
                args.lake_dir,
                [_parse_constraint(c) for c in args.constraints],
                set_values,
            )))
        elif args.cmd == "compact-deltas":
            from .pipelines.maintenance import compact_deltas

            print(json.dumps(compact_deltas(args.lake_dir)))
        elif args.cmd == "cluster":
            from .pipelines.maintenance import cluster_lake

            print(json.dumps(
                cluster_lake(args.lake_dir, args.sort_by.split(","),
                             method=args.method)
            ))
        elif args.cmd == "split":
            from .pipelines.maintenance import split_overflowing, split_partition

            if args.part is not None:
                print(json.dumps(split_partition(args.lake_dir, args.part)))
            elif args.max_partition_bytes is not None:
                print(json.dumps(
                    split_overflowing(args.lake_dir, args.max_partition_bytes)
                ))
            else:
                print(json.dumps({"error": "pass --part or --max-partition-bytes"}))
                return 2
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
