"""Lake maintenance: tombstone compaction.

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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..stages.merge import DELETED_COL
from ..state.checkpoint import (
    LakeManifest,
    commit_manifest,
    gc_unreferenced,
    load_manifest,
    utcnow_iso,
)


def compact_lake(lake_dir: str) -> dict:
    """Drop persisted tombstones from every partition that has them.
    Returns {"partitions_rewritten": n, "tombstones_dropped": n}."""
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
            new_meta[part] = {"rows": int(row["rows"]), "tombstones": 0}

    new_manifest = LakeManifest(
        num_partitions=manifest.num_partitions,
        version=manifest.version + 1,
        watermark=manifest.watermark,
        schema=manifest.schema,
        partitions=new_partitions,
        partition_meta=new_meta,
        lineage=manifest.lineage
        + [{
            "version": manifest.version + 1,
            "committed_at": utcnow_iso(),
            "op": "compact",
            "partitions_rewritten": len(stats),
            "tombstones_dropped": dropped_total,
        }],
        counters=manifest.counters,
    )
    commit_manifest(lake_dir, new_manifest)
    gc_unreferenced(lake_dir, new_manifest, previous=manifest)
    return {
        "partitions_rewritten": len(stats),
        "tombstones_dropped": dropped_total,
    }
