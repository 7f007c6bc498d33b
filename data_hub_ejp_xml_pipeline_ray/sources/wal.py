"""WAL segment discovery + watermark filtering + schema-unified read.

This is the CDC tailer — the analog of the reference's
``S3HookNewFileMonitor.iter_filter_s3_object_meta_after`` (paginated
prefix listing + fnmatch glob + ``LastModified > watermark`` predicate,
``utils/dags/airflow_s3_util_extension.py:101-138``) and of the
poll-until-new-data sensor (``:44-84``). Segment *names* are the
ordering and watermark unit (the analog of ``LastModified`` ordering at
``dags/s3_xml_import_pipeline.py:213-222``); the watermark comparison is
strictly greater, exactly like the reference (``:130-133``), with the
ambiguity the reference accepts for equal timestamps removed because
segment names are unique and totally ordered.

Reading is schema-aware: segment footers are scanned (metadata only),
grouped by physical schema, unified with the engine's widen rules
(:mod:`..schemas`), and each group is conformed to the unified wire
schema inside ``map_batches`` before ``union`` — schema evolution at
the read edge.
"""
from __future__ import annotations

import fnmatch
import os
import re
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schemas import conform_table, unify_many

SEGMENT_GLOB = "segment-*.parquet"


@dataclass(frozen=True)
class SegmentMeta:
    """Metadata for one WAL segment file (analog of an S3 object meta)."""

    name: str
    path: str
    size_bytes: int

    @property
    def segment_id(self) -> str:
        return self.name


def list_segments(
    wal_dir: str,
    pattern: str = SEGMENT_GLOB,
    exclusion_pattern: str | None = None,
) -> list[SegmentMeta]:
    """List WAL segments sorted by name (the processing order invariant).

    ``pattern`` is an fnmatch glob and ``exclusion_pattern`` a regex on
    the segment name — mirroring the reference's glob + exclusion-regex
    pair (``airflow_s3_util_extension.py:120-127``; exclusion at
    ``ejp_zip.py:61-63``).
    """
    if not os.path.isdir(wal_dir):
        return []
    exclude = re.compile(exclusion_pattern) if exclusion_pattern else None
    out = []
    for name in sorted(os.listdir(wal_dir)):
        if not fnmatch.fnmatch(name, pattern):
            continue
        if exclude is not None and exclude.match(name):
            continue
        path = os.path.join(wal_dir, name)
        out.append(SegmentMeta(name=name, path=path, size_bytes=os.path.getsize(path)))
    return out


def segments_after(
    segments: list[SegmentMeta], watermark: str | None
) -> list[SegmentMeta]:
    """Strictly-greater watermark filter (reference ``:130-133``)."""
    if watermark is None:
        return list(segments)
    return [s for s in segments if s.name > watermark]


def poll_for_new_segments(
    wal_dir: str,
    watermark: str | None,
    timeout_s: float = 120.0,
    interval_s: float = 1.0,
    pattern: str = SEGMENT_GLOB,
) -> list[SegmentMeta]:
    """Sensor analog (reference ``S3NewKeyFromLastDataDownloadDateSensor``):
    poll until at least one new segment appears or the timeout lapses."""
    deadline = time.monotonic() + timeout_s
    while True:
        fresh = segments_after(list_segments(wal_dir, pattern), watermark)
        if fresh or time.monotonic() >= deadline:
            return fresh
        time.sleep(interval_s)


def unified_wire_schema(segments: list[SegmentMeta]) -> pa.Schema:
    """Unify the physical schemas of the given segments (footer scan only)."""
    schemas = [pq.read_schema(s.path) for s in segments]
    return unify_many(schemas)


def read_segments(
    segments: list[SegmentMeta],
    schema: pa.Schema | None = None,
    override_num_blocks: int | None = None,
    conform: bool = True,
    include_paths: bool = False,
) -> ray.data.Dataset:
    """Read WAL segments as one Dataset conformed to the unified schema.

    All segments go into ONE ``read_parquet`` (mixed physical schemas
    are fine — each block keeps its file's schema) followed by a single
    parallel ``conform_table`` pass that null-fills added columns and
    casts declared widens per batch. One read op regardless of how many
    schema versions are interleaved; no ``union`` (Ray's union operator
    drains its inputs sequentially, which stalls downstream actor
    pools — measured ~2x slower than the single-read form).
    """
    if not segments:
        raise ValueError("no segments to read")
    if schema is None:
        schema = unified_wire_schema(segments)
    target = schema

    ds = ray.data.read_parquet(
        [s.path for s in segments],
        override_num_blocks=override_num_blocks,
        include_paths=include_paths,  # per-record provenance (M2 analog)
    )
    if not conform:
        # caller conforms per batch inside its own first stage (saves an
        # operator hop; pass ``schema`` along)
        return ds

    def conform_fn(batch: pa.Table) -> pa.Table:
        return conform_table(batch, target)

    return ds.map_batches(
        conform_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
