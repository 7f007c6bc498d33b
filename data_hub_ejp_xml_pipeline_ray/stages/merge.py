"""Key-partitioned last-writer-wins merge — the engine's one shuffle.

The reference's merge semantics are implicit: BigQuery ``WRITE_APPEND``
plus a ``modified_timestamp`` on every entity, with latest-wins left to
downstream consumers (``bq_data_service.py:23,35``; timestamps stamped
at ``ejp_manuscript_xml.py:150-155,199``). This module makes them
explicit and distributed:

1. **Local pre-reduce (combiner)** — inside ``map_batches``, each block
   is reduced to at most one row per url (max ``(warc_ts, seq)``). LWW
   is associative, so this is a correct combiner; it is also the skew
   defense: a hot url contributes at most one row per block to the
   shuffle, which bounds any key's shuffle fan-in by the block count
   (the two-phase local-then-global merge of SURVEY §7.5 — explicit
   salting is subsumed because the "salt" is the block id).
2. **Stable hash partitioning** — ``part = crc32(url) % P``. crc32 is
   specified by the engine forever (not a library hash that may change
   between versions), because partition -> base-file routing must be
   stable across runs for resume correctness.
3. **Per-partition global merge** — ``groupby('part').map_groups``:
   each task reads ONLY its base partition file (the base lake is never
   shuffled; shuffle volume is O(deltas)), conforms base + delta to the
   evolved schema, applies LWW + deletes, and writes an immutable
   content-addressed partition file. Tombstones are applied, never
   persisted (full-partition rewrite makes that safe).
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import conform_table
from ..state.checkpoint import partition_file_relpath

#: Marker op for rows originating from the base lake partition.
BASE_OP = "base"
DELETE_OP = "delete"

#: Hidden lake column persisting delete markers. Tombstones MUST be
#: persisted (not just applied): events are out-of-order in ``warc_ts``
#: across micro-batches, so without a stored tombstone a later batch
#: carrying an *older* update for a deleted url would resurrect it —
#: incremental ingest would diverge from full replay. Read paths filter
#: ``_deleted`` rows out; a retention/compaction pass may drop
#: tombstones once the WAL guarantees no older events remain in flight.
DELETED_COL = "_deleted"

MERGE_STATS_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int64()),
        pa.field("path", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("events_applied", pa.int64()),
    ]
)


def stable_hash_partition(urls: pa.Array | pa.ChunkedArray, num_partitions: int) -> pa.Array:
    """crc32(url) % P as an int64 array. Deterministic forever."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    out = np.empty(len(urls), dtype=np.int64)
    data = urls.to_pylist()
    for i, u in enumerate(data):
        out[i] = zlib.crc32(u.encode("utf-8")) % num_partitions
    return pa.array(out, type=pa.int64())


def local_lww(batch: pa.Table) -> pa.Table:
    """Combiner: keep only the max-``(warc_ts, seq)`` row per url within
    one block. Deterministic (ties cannot occur: ``seq`` is unique per
    url by the WAL contract)."""
    if batch.num_rows <= 1:
        return batch
    df = pl.from_arrow(batch)
    df = df.sort(["url", "warc_ts", "seq"]).unique(
        subset=["url"], keep="last", maintain_order=True
    )
    out = df.to_arrow()
    # polars may emit large_* types; cast back to the input schema.
    return conform_table(out, batch.schema)


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    return batch.append_column(
        "part", stable_hash_partition(batch.column("url"), num_partitions)
    )


def lww_reduce(table: pa.Table) -> pa.Table:
    """Global per-group LWW: keep the max-``(warc_ts, seq)`` row per
    url. Tombstone rows (``_deleted``) win like any other row and are
    RETAINED — filtering happens at read time (see :data:`DELETED_COL`)."""
    df = pl.from_arrow(table)
    df = df.sort(["url", "warc_ts", "seq"]).unique(
        subset=["url"], keep="last", maintain_order=True
    )
    return df.to_arrow()


class PartitionMerger:
    """``map_groups`` callable for one lake partition.

    Reads the partition's committed base file (if any), merges the delta
    group under LWW, and writes the next immutable version of the
    partition to a deterministic content-addressed path. Returns one
    stats row (the partition's lineage record) — the actual data never
    flows back through the driver.
    """

    def __init__(
        self,
        lake_dir: str,
        base_partitions: dict[int, str],
        lake_schema: pa.Schema,
        token: str,
    ):
        self._lake_dir = lake_dir
        self._base_partitions = base_partitions
        self._lake_schema = lake_schema  # already evolved (driver-side union)
        self._token = token

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return MERGE_STATS_SCHEMA.empty_table()
        import pyarrow.compute as pc

        part = group.column("part")[0].as_py()
        events_applied = group.num_rows
        delta = group.drop_columns(["part"])
        # Materialize the tombstone flag, then conform to the lake schema
        # (drops wire-only leftovers, null-fills columns this delta's
        # schema version didn't carry, applies declared widens).
        delta = delta.append_column(
            DELETED_COL, pc.equal(delta.column("op"), DELETE_OP)
        )
        delta = conform_table(delta, self._lake_schema)

        base_rel = self._base_partitions.get(part)
        if base_rel is not None:
            base = pq.read_table(os.path.join(self._lake_dir, base_rel))
            base = conform_table(base, self._lake_schema)
            merged = pa.concat_tables([base, delta])
        else:
            merged = delta

        merged = lww_reduce(merged)
        merged = conform_table(merged, self._lake_schema)

        rel = partition_file_relpath(part, self._token)
        out_path = os.path.join(self._lake_dir, rel)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        if merged.num_rows == 0:
            # Every row deleted: partition disappears from the manifest.
            return pa.table(
                {
                    "part": [part],
                    "path": [None],
                    "rows": [0],
                    "bytes": [0],
                    "events_applied": [events_applied],
                },
                schema=MERGE_STATS_SCHEMA,
            )
        tmp = out_path + ".inprogress"
        pq.write_table(merged, tmp)
        os.replace(tmp, out_path)  # readers never observe partial files
        return pa.table(
            {
                "part": [part],
                "path": [rel],
                "rows": [merged.num_rows],
                "bytes": [os.path.getsize(out_path)],
                "events_applied": [events_applied],
            },
            schema=MERGE_STATS_SCHEMA,
        )
