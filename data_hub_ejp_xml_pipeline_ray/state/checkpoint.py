"""Lake manifest: the exactly-once commit point + high-watermark store.

The reference keeps its incremental-ingest state as a JSON dict
``{s3_key_pattern: latest_processed_LastModified}`` in a single S3
object, re-written after every file (``ejp_xml_pipeline/etl_state.py:
14-23,26-52``), and its delivery semantics are at-least-once (crash
between load and state update re-appends, ``dags/s3_xml_import_pipeline
.py:149-170``). This module upgrades that design to exactly-once
*observable* state:

* data files are immutable and content-addressed by a deterministic
  batch token, so a retried or replayed write produces the same bytes at
  the same path (idempotent);
* the only mutation readers can observe is a single atomic
  ``os.replace`` of ``_manifest.json`` — the manifest names the exact
  set of live partition files, the segment high watermark, the unified
  lake schema, per-commit lineage and counters;
* crash before the swap leaves the previous manifest intact; orphaned
  staging files are garbage-collected lazily (the crash-safe analog of
  delete-after-load, ``etl.py:202-213``).
"""
from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

import pyarrow as pa

from ..schemas import schema_from_json, schema_to_json

MANIFEST_NAME = "_manifest.json"
DATA_DIR = "data"
MAX_LINEAGE_ENTRIES = 1000


@dataclass
class LakeManifest:
    """Committed state of one lake table."""

    num_partitions: int
    version: int = 0
    watermark: str | None = None  # last committed segment name (strictly-greater filter)
    schema: pa.Schema | None = None
    partitions: dict[int, str] = field(default_factory=dict)  # part -> relpath
    #: per-partition stats: {part: {"rows": n, "tombstones": n}} —
    #: lets maintenance (compaction) target only partitions that need it
    partition_meta: dict[int, dict[str, int]] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)
    counters: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": 1,
            "num_partitions": self.num_partitions,
            "version": self.version,
            "watermark": self.watermark,
            "schema": None if self.schema is None else schema_to_json(self.schema),
            "partitions": {str(k): v for k, v in self.partitions.items()},
            "partition_meta": {str(k): v for k, v in self.partition_meta.items()},
            "lineage": self.lineage,
            "counters": self.counters,
        }

    @classmethod
    def from_json(cls, doc: dict[str, Any]) -> "LakeManifest":
        return cls(
            num_partitions=doc["num_partitions"],
            version=doc["version"],
            watermark=doc["watermark"],
            schema=None if doc["schema"] is None else schema_from_json(doc["schema"]),
            partitions={int(k): v for k, v in doc["partitions"].items()},
            partition_meta={
                int(k): dict(v) for k, v in doc.get("partition_meta", {}).items()
            },
            lineage=list(doc.get("lineage", [])),
            counters=dict(doc.get("counters", {})),
        )


def manifest_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, MANIFEST_NAME)


def load_manifest(lake_dir: str) -> LakeManifest | None:
    """Read the committed manifest; None when the lake doesn't exist yet
    (the reference's NoSuchKey -> default-initial-state path,
    ``etl_state.py:26-52``)."""
    path = manifest_path(lake_dir)
    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        return LakeManifest.from_json(json.load(f))


def commit_manifest(lake_dir: str, manifest: LakeManifest) -> None:
    """Atomically publish a new manifest (tmp write + fsync + rename)."""
    os.makedirs(lake_dir, exist_ok=True)
    manifest.lineage = manifest.lineage[-MAX_LINEAGE_ENTRIES:]
    path = manifest_path(lake_dir)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest.to_json(), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def batch_token(watermark: str | None, segment_names: list[str]) -> str:
    """Deterministic token for one micro-batch: a pure function of the
    starting watermark and the segment set, so a crashed-and-retried
    batch rewrites identical staging paths (idempotence)."""
    h = hashlib.sha1()
    h.update((watermark or "<epoch>").encode())
    for name in segment_names:
        h.update(b"\x00")
        h.update(name.encode())
    return h.hexdigest()[:16]


def partition_file_relpath(part: int, token: str) -> str:
    return os.path.join(DATA_DIR, f"part-{part:05d}-{token}.parquet")


def gc_unreferenced(
    lake_dir: str,
    manifest: LakeManifest,
    previous: LakeManifest | None = None,
) -> list[str]:
    """Delete data files not referenced by the committed manifest —
    orphans from crashed batches and superseded partition versions.
    Single-driver write semantics (analog of the reference's run-lock,
    ``dags/s3_xml_import_pipeline.py:103-132``) make this safe to run
    immediately after a commit; pass ``previous`` to ALSO keep the
    prior manifest's files one more commit, so concurrent readers that
    loaded the old manifest finish their scans (snapshot-isolation
    grace window)."""
    data_dir = os.path.join(lake_dir, DATA_DIR)
    if not os.path.isdir(data_dir):
        return []
    live = {os.path.normpath(rel) for rel in manifest.partitions.values()}
    if previous is not None:
        live |= {os.path.normpath(rel) for rel in previous.partitions.values()}
    removed = []
    for name in os.listdir(data_dir):
        rel = os.path.normpath(os.path.join(DATA_DIR, name))
        if rel not in live:
            os.remove(os.path.join(lake_dir, rel))
            removed.append(rel)
    return removed


def utcnow_iso() -> str:
    """Wall-clock stamp for lineage metadata ONLY — never merged data
    (the reference stamps ``imported_timestamp`` into every record,
    ``ejp_zip.py:57``; we confine the clock to lineage so extraction
    stays a pure function of the input bytes)."""
    return datetime.now(timezone.utc).isoformat().replace("+00:00", "Z")
