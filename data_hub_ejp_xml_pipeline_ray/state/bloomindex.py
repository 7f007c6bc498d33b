"""Per-file BLOOM INDEX for equality/membership scan pruning — the
third leg of the file-skipping story (Delta/Iceberg bloom-filter-index
parity):

* crc32 **hash routing** prunes ``url`` point lookups (the LWW key);
* manifest **zone maps** (min/max) prune range predicates on any
  scalar column;
* this index prunes ``==`` / ``in`` predicates on HIGH-CARDINALITY
  payload columns whose per-file min/max spans nearly the whole domain
  (a ``seq``/id lookup hits every partition under zones alone).

Layout: ONE JSON sidecar ``<lake>/_bloom/index.json`` holding
``{"columns": [...], "files": {relpath: {col: {"m": bits, "k": k,
"b64": <bit words>}}}}``. Entries are keyed by the lake's immutable
content-addressed data relpaths, so an entry can NEVER go stale — a
rewritten partition gets a NEW relpath, which simply has no entry (and
is therefore never skipped) until :func:`build_bloom_index` reindexes.
The index is maintained OUT-OF-BAND by an explicit maintenance op (and
``auto_maintain``), not per commit: the ingest hot path never pays for
it, and a missing/partial/deleted index only costs pruning, never
correctness. The planner (``state.zones.plan_parts``) skips a
partition only when EVERY one of its files is proven predicate-free —
by a zone or by a bloom — and the compiled residual expression is
always re-applied on the scan output, so blooms accelerate but never
decide.

Soundness: bloom membership has false POSITIVES (~0.8%% at 10
bits/item, k=7 — a kept partition that turns out empty) but never
false negatives, so a skip is a proof. Values are hashed with a
STABLE, versioned canonical encoding (blake2b over type-tagged bytes —
never a library hash whose seed may change between releases: a
persisted index probed with a different hash would skip wrongly).

At 100-TB scale the single JSON becomes one sidecar per data file
(same keying, same staleness-free contract); the in-manifest variant
is deliberately avoided — blooms are ~1.25 KB per 1k distinct values
per column per file, which belongs next to the data, not in every
snapshot document. Reference analog: the reference has no secondary
indexes; BigQuery's own storage pruning fills this role
(``bq_data_service.py``).
"""
from __future__ import annotations

import base64
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.sketch import (
    BLOOM_K,
    bloom_add,
    bloom_contains,
    bloom_empty,
    bloom_sizes,
)
from .store import LocalFsStore

BLOOM_DIR = "_bloom"
INDEX_NAME = "index.json"
#: bump when the canonical value encoding changes — a loaded index with
#: a different encoding version is ignored (pruning lost, never wrong)
ENCODING_VERSION = 1

_LOCAL_STORE = LocalFsStore()


def _index_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, BLOOM_DIR, INDEX_NAME)


def _hash64(tag: str, normed) -> np.ndarray:
    """Stable uint64 hashes of values ALREADY normalized into the
    tag's canonical domain (blake2b digest head over tag-prefixed
    bytes) — a pure function of the encoding, immune to library hash
    seed changes; None / NaN drop out (equality never matches them)."""
    out = []
    for v in normed:
        if v is None:
            continue
        if tag == "f":
            f = float(v)
            if np.isnan(f):
                continue
            b = repr(f).encode()
        elif tag == "b":
            b = b"1" if v else b"0"
        elif tag == "s":
            b = v.encode("utf-8")
        else:  # "i" / "ts": canonical integer domain
            b = str(int(v)).encode()
        out.append(int.from_bytes(
            hashlib.blake2b(tag.encode() + b"\x00" + b, digest_size=8)
            .digest(), "big",
        ))
    return np.array(out, dtype=np.uint64)


def _coerce_probe(tag: str, v):
    """Normalize a constraint VALUE into the bloom's stored domain —
    the EXACT mirror of the build-side normalization (zones'
    ``_tag_and_norm`` families). None = incomparable: the bloom then
    never prunes, because a cross-domain hash mismatch would read as a
    false NEGATIVE and make a skip unsound."""
    from .zones import _ts_us

    if tag == "ts":
        return _ts_us(v)
    if tag == "i":
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, np.integer)):
            return int(v)
        if isinstance(v, float) and v.is_integer():
            return int(v)
        return None
    if tag == "f":
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return float(v)
        return None
    if tag == "s":
        return v if isinstance(v, str) else None
    if tag == "b":
        return v if isinstance(v, bool) else None
    return None


def _file_bloom_doc(path: str, columns: list[str]) -> dict:
    """Bloom docs for one data file: distinct non-null values per
    indexed column, normalized via the column's arrow-type tag (the
    same tag families the zone maps use), sized at 10 bits/distinct-
    value. Pure function of the (immutable) file bytes — a rebuild is
    byte-identical. Columns whose type has no zone tag (nested,
    binary) are not indexable and are silently absent from the doc."""
    from .zones import _tag_and_norm

    pf = pq.ParquetFile(path)
    tags = {}
    for f in pf.schema_arrow:
        if f.name in columns:
            tn = _tag_and_norm(f.type)
            if tn is not None:
                tags[f.name] = tn
    if not tags:
        return {}
    t = pf.read(columns=list(tags))
    doc = {}
    for col, (tag, norm) in tags.items():
        vals = pc.unique(pc.drop_null(t.column(col))).to_pylist()
        h = _hash64(tag, [norm(v) for v in vals])
        bits = bloom_empty(bloom_sizes(max(1, h.size)))
        bloom_add(bits, h)
        doc[col] = {
            "t": tag,
            "m": int(bits.size * 64),
            "k": BLOOM_K,
            "b64": base64.b64encode(bits.tobytes()).decode("ascii"),
        }
    return doc


def build_bloom_index(
    lake_dir: str, columns: list[str] | None = None, *, store=None
) -> dict:
    """Build or incrementally refresh the lake's bloom index: entries
    for live data files missing one are built (one Ray task per file,
    only the indexed columns leave storage), dead-relpath entries are
    dropped, and the index publishes atomically through the store
    seam. ``columns=None`` reuses the stored column list (the
    ``auto_maintain`` refresh path)."""
    from .checkpoint import load_manifest

    store = store or _LOCAL_STORE
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    existing = load_bloom_index(lake_dir, store=store) or {
        "encoding": ENCODING_VERSION, "columns": [], "files": {},
    }
    if columns is None:
        columns = list(existing.get("columns", []))
    if not columns:
        raise ValueError("build_bloom_index needs at least one column")
    for col in columns:
        if manifest.schema is not None and col not in manifest.schema.names:
            raise ValueError(f"unknown column {col!r}")
    live = sorted(manifest.all_data_relpaths())
    same_cols = sorted(columns) == sorted(existing.get("columns", []))
    files: dict = {
        rel: doc for rel, doc in existing.get("files", {}).items()
        if rel in set(live) and same_cols
    }
    todo = [rel for rel in live if rel not in files]
    if todo:
        import ray

        @ray.remote(num_cpus=1)
        def index_one(rel: str) -> tuple[str, dict]:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
            return rel, _file_bloom_doc(os.path.join(lake_dir, rel), columns)

        for rel, doc in ray.get([index_one.remote(r) for r in todo]):
            files[rel] = doc
    index = {
        "encoding": ENCODING_VERSION,
        "columns": sorted(columns),
        "manifest_version": manifest.version,
        "files": files,
    }
    store.put_atomic(
        _index_path(lake_dir), json.dumps(index).encode("utf-8")
    )
    return {
        "columns": index["columns"], "files_indexed": len(files),
        "files_built": len(todo), "version": manifest.version,
    }


def load_bloom_index(lake_dir: str, *, store=None) -> dict | None:
    """The persisted index, or None when absent / written by a
    different encoding version (ignored: pruning lost, never wrong)."""
    store = store or _LOCAL_STORE
    try:
        raw = store.get_bytes(_index_path(lake_dir))
    except FileNotFoundError:
        return None
    try:
        doc = json.loads(raw)
    except ValueError:
        return None
    if doc.get("encoding") != ENCODING_VERSION:
        return None
    return doc


def bloom_allows(file_doc: dict | None, col: str, op: str, *value) -> bool:
    """May this file contain a row satisfying ``col op value``?
    True = cannot prove empty. Only equality/membership ops can be
    proven by a bloom; everything else defers to zones."""
    if file_doc is None:
        return True
    ent = file_doc.get(col)
    if ent is None:
        return True  # column not indexed in this file
    if op == "==":
        probes = [value[0]] if value else []
    elif op == "in":
        probes = list(value[0] or [])
    else:
        return True
    if not probes:
        return False  # `in ()` matches nothing
    tag = ent.get("t")
    normed = [_coerce_probe(tag, v) for v in probes]
    if any(v is None for v in normed):
        return True  # incomparable probe: cannot prove absence
    h = _hash64(tag, normed)
    if h.size != len(probes):
        return True  # NaN probe etc.: cannot prove absence
    bits = np.frombuffer(
        base64.b64decode(ent["b64"]), dtype=np.uint64
    ).copy()
    return bool(bloom_contains(bits, h, int(ent.get("k", BLOOM_K))).any())
