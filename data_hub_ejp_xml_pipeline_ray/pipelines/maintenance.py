"""Lake maintenance: tombstone compaction + partition-count evolution.

Tombstones are persisted by the merge so late (out-of-order) events
cannot resurrect deleted keys (see ``stages/merge.DELETED_COL``). Once
the operator knows the WAL can no longer deliver events older than the
committed watermark (a retention decision, like the reference deleting
staged shards only after a successful load, ``etl.py:202-213``),
compaction physically drops tombstone rows and re-commits.

Only partitions whose manifest stats show ``tombstones > 0`` are
rewritten — the others are untouched (manifest entries carried over),
so compaction cost is proportional to the deleted set, not the lake.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..stages.merge import DELETED_COL
from ..state.checkpoint import (
    LakeManifest,
    commit_manifest,
    gc_unreferenced,
    list_versions,
    load_manifest,
    residue_modulus,
    utcnow_iso,
    verify_lock,
    writer_lock,
)


def vacuum(lake_dir: str, keep: int = 1) -> dict:
    """One-shot history pruning (the Delta-VACUUM analog): keep only the
    newest ``keep`` snapshot versions and delete every data file no
    retained snapshot references. Does NOT commit a new version —
    pruning history is not an observable state change — and does not
    alter the lake's standing ``retain_versions`` policy (set that via
    ``CdcConfig`` on the next ingest). Runs under the writer lock so a
    concurrent committer cannot race the sweep; readers holding a
    pruned snapshot lose it, exactly like Delta/Iceberg vacuum."""
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    with writer_lock(lake_dir) as lock_token:
        current = load_manifest(lake_dir)  # re-read under the lock
        verify_lock(lake_dir, lock_token)  # fencing before deletes
        removed = gc_unreferenced(lake_dir, current, retain_versions=keep)
    return {
        "files_removed": len(removed),
        "retained_versions": list_versions(lake_dir),
    }


def auto_maintain(
    lake_dir: str,
    *,
    tombstone_ratio: float = 0.2,
    max_partition_bytes: int = 1 << 30,
    vacuum_keep: int | None = None,
) -> dict:
    """One-call MAINTENANCE POLICY (the cron entry point): decide from
    MANIFEST STATS ONLY — never a data scan — and run what's due:

    * compact when persisted tombstones exceed ``tombstone_ratio`` of
      live+tombstone rows (reclaims space, speeds every read);
    * split any partition above ``max_partition_bytes`` (one level per
      call, same fixpoint contract as :func:`split_overflowing`);
    * optionally vacuum history down to ``vacuum_keep`` snapshots.

    Each action is the existing lock+CAS-protected op; a concurrent
    ingest either waits on the lock or this call fails fast. Returns
    what ran and why."""
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    meta = manifest.partition_meta
    tombs = sum(m.get("tombstones", 0) for m in meta.values())
    rows = sum(m.get("rows", 0) for m in meta.values())
    actions: dict = {
        "tombstones": tombs, "rows": rows,
        "compacted": False, "splits": 0, "vacuumed": False,
    }
    if tombs and rows and tombs / rows >= tombstone_ratio:
        r = compact_lake(lake_dir)
        actions["compacted"] = True
        actions["tombstones_dropped"] = r["tombstones_dropped"]
    r = split_overflowing(lake_dir, max_partition_bytes)
    actions["splits"] = r.get("partitions_split", r.get("splits", 0))
    if vacuum_keep is not None:
        v = vacuum(lake_dir, keep=vacuum_keep)
        actions["vacuumed"] = True
        actions["files_removed"] = v["files_removed"]
    return actions


def rewind_watermark(lake_dir: str, to: str | None = None) -> dict:
    """Controlled BACKFILL: move the tailer high-watermark BACKWARD so
    the next ingest reprocesses WAL segments after ``to`` (``None`` =
    from the beginning). Safe by construction: the LWW merge is
    idempotent, so replaying already-applied segments converges to the
    identical lake state (the crash/resume tests prove the same law).
    Moving the watermark FORWARD is refused — that would make the
    tailer silently skip unprocessed WAL. Commits a new version under
    the writer lock (op ``rewind``) so the operation is in the
    lineage, auditable and CAS-protected against concurrent writers."""
    with writer_lock(lake_dir) as lock_token:
        manifest = load_manifest(lake_dir)
        if manifest is None:
            raise FileNotFoundError(f"no committed lake at {lake_dir}")
        if manifest.watermark is None:
            return {"rewound": False, "watermark": None}
        if to is not None and to > manifest.watermark:
            raise ValueError(
                f"refusing to move the watermark FORWARD "
                f"({manifest.watermark!r} -> {to!r}): the tailer would "
                f"skip unprocessed WAL"
            )
        new_manifest = LakeManifest(
            num_partitions=manifest.num_partitions,
            version=manifest.version + 1,
            watermark=to,
            schema=manifest.schema,
            partitions=dict(manifest.partitions),
            partition_meta=dict(manifest.partition_meta),
            splits=list(manifest.splits),
            lineage=manifest.lineage + [{
                "version": manifest.version + 1,
                "committed_at": utcnow_iso(),
                "op": "rewind",
                "from_watermark": manifest.watermark,
                "to_watermark": to,
            }],
            counters=manifest.counters,
            retain_versions=manifest.retain_versions,
            kind=manifest.kind,
        )
        commit_manifest(
            lake_dir, new_manifest, expected_version=manifest.version
        )
        verify_lock(lake_dir, lock_token)
        gc_unreferenced(lake_dir, new_manifest, previous=manifest)
    return {
        "rewound": True, "from": manifest.watermark, "to": to,
        "version": new_manifest.version,
    }


def compact_lake(lake_dir: str) -> dict:
    """Drop persisted tombstones from every partition that has them.
    Returns {"partitions_rewritten": n, "tombstones_dropped": n}.
    Runs under the writer lock with a CAS commit — a concurrent ingest
    either wins the lock first or fails this compact fast, never gets
    silently overwritten."""
    with writer_lock(lake_dir) as lock_token:
        return _compact_locked(lake_dir, lock_token)


def _compact_locked(lake_dir: str, lock_token: str) -> dict:
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    targets = [
        (part, rel)
        for part, rel in manifest.partitions.items()
        if manifest.partition_meta.get(part, {}).get("tombstones", 1) > 0
    ]
    if not targets:
        return {"partitions_rewritten": 0, "tombstones_dropped": 0}

    token = f"compact-{manifest.version + 1}"

    def rewrite(batch: pa.Table) -> pa.Table:
        out_parts, out_paths, out_rows, out_dropped = [], [], [], []
        for part, rel in zip(
            batch.column("part").to_pylist(), batch.column("rel").to_pylist()
        ):
            table = pq.read_table(os.path.join(lake_dir, rel))
            if DELETED_COL in table.column_names:
                mask = pc.fill_null(pc.invert(table.column(DELETED_COL)), True)
                kept = table.filter(mask)
            else:
                kept = table
            dropped = table.num_rows - kept.num_rows
            if kept.num_rows == 0:
                out_parts.append(part)
                out_paths.append(None)
                out_rows.append(0)
                out_dropped.append(dropped)
                continue
            new_rel = os.path.join("data", f"part-{part:05d}-{token}.parquet")
            out_path = os.path.join(lake_dir, new_rel)
            tmp = out_path + ".inprogress"
            pq.write_table(kept, tmp)
            os.replace(tmp, out_path)
            out_parts.append(part)
            out_paths.append(new_rel)
            out_rows.append(kept.num_rows)
            out_dropped.append(dropped)
        return pa.table(
            {"part": pa.array(out_parts, pa.int64()),
             "path": pa.array(out_paths, pa.string()),
             "rows": pa.array(out_rows, pa.int64()),
             "dropped": pa.array(out_dropped, pa.int64())}
        )

    work = ray.data.from_arrow(
        pa.table({"part": [p for p, _ in targets], "rel": [r for _, r in targets]})
    ).repartition(min(len(targets), 32))
    stats = work.map_batches(rewrite, batch_format="pyarrow").take_all()

    new_partitions = dict(manifest.partitions)
    new_meta = dict(manifest.partition_meta)
    dropped_total = 0
    for row in stats:
        part = int(row["part"])
        dropped_total += int(row["dropped"])
        if row["path"] is None:
            new_partitions.pop(part, None)
            new_meta.pop(part, None)
        else:
            new_partitions[part] = row["path"]
            # preserve modulus (split routing bookkeeping) across rewrites
            kept_meta = dict(manifest.partition_meta.get(part, {}))
            kept_meta.update(
                rows=int(row["rows"]), tombstones=0,
                bytes=os.path.getsize(os.path.join(lake_dir, row["path"])),
            )
            new_meta[part] = kept_meta

    new_manifest = LakeManifest(
        num_partitions=manifest.num_partitions,
        version=manifest.version + 1,
        watermark=manifest.watermark,
        schema=manifest.schema,
        partitions=new_partitions,
        partition_meta=new_meta,
        splits=list(manifest.splits),
        lineage=manifest.lineage
        + [{
            "version": manifest.version + 1,
            "committed_at": utcnow_iso(),
            "op": "compact",
            "partitions_rewritten": len(stats),
            "tombstones_dropped": dropped_total,
        }],
        counters=manifest.counters,
        retain_versions=manifest.retain_versions,
        kind=manifest.kind,
    )
    commit_manifest(
        lake_dir, new_manifest, expected_version=manifest.version
    )
    verify_lock(lake_dir, lock_token)  # fencing before deletes
    gc_unreferenced(lake_dir, new_manifest, previous=manifest)
    return {
        "partitions_rewritten": len(stats),
        "tombstones_dropped": dropped_total,
    }


def split_partition(lake_dir: str, part: int) -> dict:
    """Partition-count evolution: replace live partition ``(r, m)`` by
    children ``(r, 2m)`` and ``(r+m, 2m)`` (one extra crc32 bit), so a
    partition that outgrew one task's memory at merge time is halved
    without touching any other partition. The split is recorded in the
    manifest's ``splits`` map — ingest/lookup routing resolves through
    it forever, so the crc32 partitioning contract survives. Runs the
    rewrite in a Ray task (the partition may be large); commits CAS
    under the writer lock.

    At 100x data with a fixed P this is the maintenance valve the r1
    audit called for: ``partition_meta`` carries per-partition bytes to
    drive :func:`split_overflowing`."""
    import ray

    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    if part not in manifest.partitions:
        raise KeyError(f"partition {part} not live in {lake_dir}")
    splits = manifest.split_set()
    m = residue_modulus(part, manifest.num_partitions, splits)
    rel = manifest.partitions[part]
    token = f"split-{manifest.version + 1}"

    @ray.remote(num_cpus=1)
    def rewrite_children(path: str, r: int, mod: int) -> list[dict]:
        import numpy as np
        import pyarrow as _pa

        from ..stages.merge import DELETED_COL as _DEL, crc32_column

        _pa.set_cpu_count(1)
        table = pq.read_table(path)
        crc = crc32_column(table.column("url")).astype(np.int64)
        child = crc % (2 * mod)
        out = []
        for c in (r, r + mod):
            sub = table.filter(_pa.array(child == c))
            if sub.num_rows == 0:
                continue
            new_rel = os.path.join("data", f"part-{c:05d}-{token}.parquet")
            out_path = os.path.join(lake_dir, new_rel)
            tmp = out_path + ".inprogress"
            pq.write_table(sub, tmp)
            os.replace(tmp, out_path)
            tomb = (
                int(pc.sum(sub.column(_DEL)).as_py() or 0)
                if _DEL in sub.column_names else 0
            )
            out.append({
                "part": c, "path": new_rel, "rows": sub.num_rows,
                "tombstones": tomb, "bytes": os.path.getsize(out_path),
            })
        return out

    children = ray.get(
        rewrite_children.remote(os.path.join(lake_dir, rel), part, m)
    )
    with writer_lock(lake_dir) as lock_token:
        current = load_manifest(lake_dir)
        new_partitions = dict(current.partitions)
        new_meta = dict(current.partition_meta)
        new_partitions.pop(part, None)
        new_meta.pop(part, None)
        for ch in children:
            new_partitions[int(ch["part"])] = ch["path"]
            new_meta[int(ch["part"])] = {
                "rows": int(ch["rows"]), "tombstones": int(ch["tombstones"]),
                "bytes": int(ch["bytes"]), "modulus": 2 * m,
            }
        new_manifest = LakeManifest(
            num_partitions=current.num_partitions,
            version=current.version + 1,
            watermark=current.watermark,
            schema=current.schema,
            partitions=new_partitions,
            partition_meta=new_meta,
            splits=list(current.splits) + [[int(part), int(m)]],
            lineage=current.lineage + [{
                "version": current.version + 1,
                "committed_at": utcnow_iso(),
                "op": "split",
                "parent": int(part), "modulus": int(m),
                "children": [int(c["part"]) for c in children],
            }],
            counters=current.counters,
            retain_versions=current.retain_versions,
            kind=current.kind,
        )
        commit_manifest(
            lake_dir, new_manifest, expected_version=manifest.version
        )
        verify_lock(lake_dir, lock_token)  # fencing before deletes
        gc_unreferenced(lake_dir, new_manifest, previous=manifest)
    return {
        "parent": part, "modulus": m,
        "children": {int(c["part"]): int(c["rows"]) for c in children},
    }


def split_overflowing(lake_dir: str, max_partition_bytes: int) -> dict:
    """Split every live partition whose committed size exceeds
    ``max_partition_bytes`` (driven by the manifest's per-partition
    byte stats — no data scan). One split level per call; run to
    fixpoint from a cron if partitions are badly overgrown."""
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    over = [
        part for part, meta in manifest.partition_meta.items()
        if meta.get("bytes", 0) > max_partition_bytes
        and part in manifest.partitions
    ]
    results = [split_partition(lake_dir, part) for part in sorted(over)]
    return {"splits": len(results), "parents": [r["parent"] for r in results]}

def _zorder_indices(table: pa.Table, keys: list[str]) -> pa.Array:
    """Sort order for MULTI-DIMENSIONAL clustering: dense-rank each key
    column (any dtype, vectorized), normalize ranks onto a shared
    ``64 // k``-bit budget, interleave the bits (Morton code) and sort
    by the resulting z-value. Unlike lexicographic multi-key sort —
    which prunes perfectly on the FIRST key and barely on later ones —
    z-order keeps row-group min/max stats selective for EVERY
    clustering column (Delta's OPTIMIZE ZORDER BY semantics). Nulls
    rank lowest."""
    import polars as pl

    n = table.num_rows
    bits = 64 // len(keys)
    z = np.zeros(n, dtype=np.uint64)
    ranks = (
        pl.from_arrow(table.select(keys))
        .select([
            pl.col(k).rank("dense").fill_null(0).alias(k) for k in keys
        ])
    )
    for j, k in enumerate(keys):
        r = ranks[k].to_numpy().astype(np.uint64)
        hi = max(int(r.max()), 1)
        # scale dense ranks onto the per-column bit budget
        v = (r * (((np.uint64(1) << np.uint64(bits)) - np.uint64(1)))) // np.uint64(hi)
        for b in range(bits):
            z |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * len(keys) + j
            )
    return pa.array(np.argsort(z, kind="stable").astype(np.int64))


def cluster_lake(
    lake_dir: str,
    sort_by: "list[str] | str" = "url",
    *,
    row_group_rows: int = 64_000,
    method: str = "linear",
) -> dict:
    """Rewrite every partition file SORTED by ``sort_by`` with bounded
    row groups — the single-sort-key analog of Delta's ``OPTIMIZE
    ZORDER BY``. After clustering, parquet row-group min/max statistics
    become selective for the sort key, so the predicate-pushdown lake
    reads (``read_lake(filter=...)``) skip whole row groups instead of
    scanning every one: at 100 TB a point lookup touches
    O(log row-groups) of a partition, not all of it.

    Logical state is unchanged (a pure layout rewrite, like
    compaction): the commit bumps the version with op ``cluster`` so
    the change feed correctly reports zero row changes across it. One
    Ray task per partition file; cost is one read + sort + write of
    each partition, so run it off the ingest path (the reference has no
    analog — its store is append-only JSONL into BigQuery).
    """
    keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
    if method not in ("linear", "zorder"):
        raise ValueError(f"unknown cluster method {method!r}")
    with writer_lock(lake_dir) as lock_token:
        manifest = load_manifest(lake_dir)
        if manifest is None:
            raise FileNotFoundError(f"no committed lake at {lake_dir}")
        for k in keys:
            if manifest.schema is not None and k not in manifest.schema.names:
                raise ValueError(
                    f"sort key {k!r} not in lake schema "
                    f"{manifest.schema.names}"
                )
        targets = sorted(manifest.partitions.items())
        if not targets:
            return {"partitions_rewritten": 0, "sort_by": keys}
        token = f"cluster-{manifest.version + 1}"

        def rewrite(batch: pa.Table) -> pa.Table:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
            out_parts, out_paths, out_rows, out_bytes = [], [], [], []
            for part, rel in zip(
                batch.column("part").to_pylist(), batch.column("rel").to_pylist()
            ):
                table = pq.read_table(os.path.join(lake_dir, rel))
                if method == "zorder" and len(keys) > 1:
                    idx = _zorder_indices(table, keys)
                else:
                    idx = pc.sort_indices(
                        table, sort_keys=[(k, "ascending") for k in keys]
                    )
                table = table.take(idx)
                new_rel = os.path.join("data", f"part-{part:05d}-{token}.parquet")
                out_path = os.path.join(lake_dir, new_rel)
                tmp = out_path + ".inprogress"
                pq.write_table(table, tmp, row_group_size=row_group_rows)
                os.replace(tmp, out_path)
                out_parts.append(part)
                out_paths.append(new_rel)
                out_rows.append(table.num_rows)
                out_bytes.append(os.path.getsize(out_path))
            return pa.table(
                {"part": pa.array(out_parts, pa.int64()),
                 "path": pa.array(out_paths, pa.string()),
                 "rows": pa.array(out_rows, pa.int64()),
                 "bytes": pa.array(out_bytes, pa.int64())}
            )

        work = ray.data.from_arrow(
            pa.table({"part": [p for p, _ in targets],
                      "rel": [r for _, r in targets]})
        ).repartition(min(len(targets), 32))
        stats = work.map_batches(rewrite, batch_format="pyarrow").take_all()

        new_partitions = dict(manifest.partitions)
        new_meta = dict(manifest.partition_meta)
        for row in stats:
            part = int(row["part"])
            new_partitions[part] = row["path"]
            kept_meta = dict(manifest.partition_meta.get(part, {}))
            kept_meta.update(rows=int(row["rows"]), bytes=int(row["bytes"]))
            new_meta[part] = kept_meta

        new_manifest = LakeManifest(
            num_partitions=manifest.num_partitions,
            version=manifest.version + 1,
            watermark=manifest.watermark,
            schema=manifest.schema,
            partitions=new_partitions,
            partition_meta=new_meta,
            splits=list(manifest.splits),
            lineage=manifest.lineage
            + [{
                "version": manifest.version + 1,
                "committed_at": utcnow_iso(),
                "op": "cluster",
                "sort_by": keys,
                "method": method,
                "partitions_rewritten": len(stats),
            }],
            counters=manifest.counters,
            retain_versions=manifest.retain_versions,
            kind=manifest.kind,
        )
        commit_manifest(
            lake_dir, new_manifest, expected_version=manifest.version
        )
        verify_lock(lake_dir, lock_token)  # fencing before deletes
        gc_unreferenced(lake_dir, new_manifest, previous=manifest)
    return {
        "partitions_rewritten": len(stats), "sort_by": keys,
        "method": method,
    }
