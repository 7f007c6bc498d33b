"""Cross-table CATALOG: atomic multi-lake snapshots.

One WAL batch often feeds SEVERAL lakes (the page lake, the group-valued
entity lake, a nested-struct lake — the reference's one XML ingest loads
multiple BigQuery tables the same way, ``etl.py``/``s3_xml_import_
pipeline.py``). Each lake commits its own manifest independently, so a
reader joining two lakes mid-ingest could see table A at WAL offset n+1
and table B still at n — the classic multi-table consistency gap that
Nessie / Iceberg multi-table transactions close.

The catalog closes it the same way: a single ``_catalog.json`` document
mapping table name -> (lake dir, pinned version), CAS-published through
the storage seam (``state/store.py``), advanced to a new consistent set
in ONE atomic pointer swap only after EVERY member lake committed its
batch. Readers that resolve versions through :func:`catalog_read` see
either all tables at the old batch or all at the new one — never a mix.
Per-lake readers are unaffected (the catalog is a layer above manifests,
not a replacement).

Write protocol (:func:`run_consistent_ingest`): ingest the same WAL
range into every member lake (each under its own writer lock / CAS /
crash-resume machinery — nothing new below the catalog), assert the
watermarks landed equal, then :func:`commit_catalog`. A crash after
lake A committed but before lake B leaves the CATALOG untouched — its
doc still names the previous consistent set, physically lagging lakes
simply catch up on the next run (idempotent by the strictly-greater
watermark), and only then does the catalog advance: the transactional-
outbox shape, recovery is a retry, never an undo.

Retention: the catalog's pinned versions are protected from each lake's
retention/vacuum by the existing TAG machinery (a rolling ``catalog``
tag per member lake — tagged versions are GC-exempt,
``state/checkpoint.py:gc_unreferenced``). The commit rolls tags in a
crash-safe order: pin the NEW versions under ``catalog-next`` first,
swap the doc, then roll ``catalog`` and drop ``catalog-next`` — a crash
anywhere leaves both generations pinned (over-retention, never a
dangling catalog pointer).
"""
from __future__ import annotations

import json
import os
from typing import Any

from ..state.checkpoint import (
    ConcurrentWriterError,
    delete_tag,
    load_manifest,
    tag_version,
    utcnow_iso,
)
from ..state.store import Store, resolve_store

CATALOG_FILE = "_catalog.json"
CATALOG_TAG = "catalog"
CATALOG_NEXT_TAG = "catalog-next"


def _catalog_path(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, CATALOG_FILE)


def load_catalog(catalog_dir: str, *, store: Store | None = None) -> dict | None:
    """The committed catalog document, or None before the first commit:
    ``{"version": n, "committed_at": iso,
    "tables": {name: {"dir": path, "version": v}}}``."""
    store = store if store is not None else resolve_store(catalog_dir)
    try:
        return json.loads(store.get_bytes(_catalog_path(catalog_dir)))
    except FileNotFoundError:
        return None


def commit_catalog(
    catalog_dir: str,
    tables: dict[str, tuple[str, int | None]],
    *,
    store: Store | None = None,
) -> dict:
    """Atomically publish a new consistent set: ``tables`` maps table
    name -> (lake dir, version); version None = that lake's current
    head. Every named version must be a retained snapshot. The member
    set may grow/shrink between commits (dropped members lose their
    catalog pin). Raises :class:`ConcurrentWriterError` when another
    catalog committer won the CAS race."""
    store = store if store is not None else resolve_store(catalog_dir)
    resolved: dict[str, dict[str, Any]] = {}
    for name, (lake_dir, version) in tables.items():
        if version is None:
            m = load_manifest(lake_dir, store=store)
            if m is None:
                raise FileNotFoundError(f"no committed lake at {lake_dir}")
            version = m.version
        resolved[name] = {"dir": os.path.abspath(lake_dir),
                          "version": int(version)}

    prev = load_catalog(catalog_dir, store=store)
    # 1) pin the NEW versions before the doc can name them (tag_version
    #    verifies the snapshot exists — a vacuumed version fails here,
    #    BEFORE anything was published)
    for name, ent in resolved.items():
        tag_version(ent["dir"], CATALOG_NEXT_TAG, ent["version"], store=store)

    # 2) the atomic point: CAS the catalog document
    doc = {
        "version": (prev["version"] + 1) if prev else 1,
        "committed_at": utcnow_iso(),
        "tables": resolved,
    }
    data = json.dumps(doc, sort_keys=True).encode("utf-8")
    path = _catalog_path(catalog_dir)
    if prev is None:
        os.makedirs(catalog_dir, exist_ok=True)
        if not store.put_if_absent(path, data):
            raise ConcurrentWriterError(
                f"catalog at {catalog_dir} appeared during commit"
            )
    else:
        expected = json.dumps(prev, sort_keys=True).encode("utf-8")
        if not store.replace_if_matches(path, expected, data):
            raise ConcurrentWriterError(
                f"catalog at {catalog_dir} moved during commit of "
                f"v{doc['version']}"
            )

    # 3) roll the standing pins: catalog -> new versions; release the
    #    previous generation (and any member that left the catalog)
    for name, ent in resolved.items():
        tag_version(ent["dir"], CATALOG_TAG, ent["version"], store=store)
        delete_tag(ent["dir"], CATALOG_NEXT_TAG, store=store)
    if prev is not None:
        gone = set(prev["tables"]) - set(resolved)
        for name in gone:
            d = prev["tables"][name]["dir"]
            delete_tag(d, CATALOG_TAG, store=store)
            delete_tag(d, CATALOG_NEXT_TAG, store=store)
    return doc


def catalog_read(
    catalog_dir: str, name: str, *, store: Store | None = None, **read_kwargs
):
    """Read table ``name`` AT ITS CATALOG-PINNED VERSION (time-travel
    through the consistent set) — two tables read through the same
    catalog document always sit at the same WAL batch boundary. Extra
    kwargs (columns/filter/constraints) pass through to
    :func:`..pipelines.cdc.read_lake`."""
    from .cdc import read_lake

    doc = load_catalog(catalog_dir, store=store)
    if doc is None:
        raise FileNotFoundError(f"no committed catalog at {catalog_dir}")
    if name not in doc["tables"]:
        raise KeyError(
            f"no table {name!r} in catalog {catalog_dir} "
            f"(tables: {sorted(doc['tables'])})"
        )
    ent = doc["tables"][name]
    return read_lake(ent["dir"], version=ent["version"], **read_kwargs)


def catalog_snapshot(
    catalog_dir: str, name: str, *, store: Store | None = None
):
    """Whole pinned table as one Arrow table (small lakes / tests)."""
    from .cdc import lake_snapshot

    doc = load_catalog(catalog_dir, store=store)
    if doc is None:
        raise FileNotFoundError(f"no committed catalog at {catalog_dir}")
    ent = doc["tables"][name]
    return lake_snapshot(ent["dir"], version=ent["version"])


def run_consistent_ingest(
    catalog_dir: str,
    cfgs: dict[str, Any],
    *,
    entity: frozenset[str] | set[str] = frozenset(),
    store: Store | None = None,
) -> dict:
    """Ingest pending WAL segments into EVERY member lake, then advance
    the catalog to the new consistent set in one commit. ``cfgs`` maps
    table name -> :class:`..pipelines.cdc.CdcConfig`; names in
    ``entity`` run the group-valued entity ingest. All members must
    tail the same WAL (equal post-ingest watermarks are asserted — a
    mixed-offset catalog would be the exact inconsistency this layer
    exists to prevent).

    Crash semantics: each lake ingest is the existing locked/CAS/
    resumable micro-batch machinery; a crash between lakes leaves the
    catalog at the PREVIOUS consistent set and the next call converges
    (lagging lakes catch up, caught-up lakes no-op on the watermark)
    before the catalog advances."""
    from .cdc import run_entity_ingest, run_ingest

    reports = {}
    for name, cfg in cfgs.items():
        runner = run_entity_ingest if name in entity else run_ingest
        reports[name] = runner(cfg)
    watermarks = {name: r.watermark for name, r in reports.items()}
    if len(set(watermarks.values())) > 1:
        raise RuntimeError(
            f"member lakes ended at different watermarks {watermarks}; "
            "a catalog must snapshot one WAL offset — are the configs "
            "tailing the same WAL with the same segment glob?"
        )
    doc = commit_catalog(
        catalog_dir,
        {name: (cfg.lake_dir, None) for name, cfg in cfgs.items()},
        store=store,
    )
    return {
        "catalog_version": doc["version"],
        "watermark": next(iter(watermarks.values()), None),
        "tables": {
            name: {
                "version": doc["tables"][name]["version"],
                "commits": reports[name].commits,
                "events_applied": reports[name].events_applied,
            }
            for name in cfgs
        },
    }
