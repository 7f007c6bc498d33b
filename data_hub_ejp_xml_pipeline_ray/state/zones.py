"""Manifest zone maps: per-FILE column min/max statistics + scan pruning.

The Delta/Iceberg "file skipping" piece of the lake: every committed
data file gets a small per-column statistics doc (min, max, null
count — read from the parquet FOOTER it already carries, no data
scan), stored in the manifest keyed by the file's immutable
content-addressed relpath. A constrained read
(:func:`..pipelines.cdc.read_lake` with ``constraints=[...]``) then
skips whole partitions whose statistics prove no row can match —
before a single data byte moves. At 100 TB this is the difference
between "open 100k footers to find the 3 partitions touched since T"
and "read 3 files".

Two pruning mechanisms compose:

* **hash routing** — ``url == v`` / ``url in [...]`` constraints route
  through the SAME crc32 partitioner the writer uses
  (:func:`..state.checkpoint.resolve_partition` over the split map), so
  a point lookup reads exactly one partition with zero statistics
  required — index-free point reads, correct by construction;
* **zone maps** — range/equality/membership constraints on any scalar
  column prune partitions whose per-file [min, max] envelopes cannot
  satisfy them.

**Soundness — partition granularity, never file granularity.** Under
merge-on-read a partition's state is the LWW reduction of base + delta
files; skipping ONE file of a partition could resurrect a superseded
row (the skipped delta may hold the newer version of a url whose stale
version matches the predicate). So the planner only ever skips a
partition when EVERY one of its files is provably predicate-free —
each file possibly by a different constraint. Every effective
(post-LWW) row is physically present in some file of its partition, so
"no file can hold a matching row" implies "no effective row matches".

Statistics are an OPTIMIZATION, never load-bearing: the same
constraints are always re-applied as a vectorized filter on the scan
output (:func:`constraints_to_expression`), so a missing/unknown zone
entry only costs a read, never correctness. Predicate semantics are
SQL WHERE (NULL comparisons are false — the opposite of the ingest
CHECK gate in ``stages.merge.check_constraints``, where NULL passes).

Reference analog: the reference filters S3 listings by prefix/pattern
before downloading (``ejp_xml_pipeline/utils/s3.py:11-34``); this is
the same "prune at the listing, not after the fetch" discipline
carried into a statistics-bearing table format.
"""
from __future__ import annotations

import os
import zlib
from datetime import datetime, timezone
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

#: Read-side predicate operators (the CLI ``--constraint COL,OP[,VALUE]``
#: grammar, shared with the ingest CHECK gate).
PREDICATE_OPS = (
    "<", "<=", ">", ">=", "==", "!=", "in", "not_in", "not_null", "matches",
)

_RANGE_OPS = {"<", "<=", ">", ">=", "==", "!=", "in", "not_in"}


def _ts_us(v: Any) -> int | None:
    """Normalize a timestamp-ish value (datetime / ISO string /
    epoch-us int) to UTC epoch microseconds; naive values are read as
    UTC (the lake's wire contract)."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        try:
            v = datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            return None
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        d = v - datetime(1970, 1, 1, tzinfo=timezone.utc)
        return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
    return None


def _tag_and_norm(t: pa.DataType):
    """(tag, normalizer) for a zone-eligible arrow type, else None."""
    if pa.types.is_boolean(t):
        return "b", lambda v: bool(v)
    if pa.types.is_integer(t):
        return "i", lambda v: int(v)
    if pa.types.is_floating(t):
        return "f", lambda v: float(v)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "s", lambda v: v.decode("utf-8", "replace") if isinstance(v, bytes) else str(v)
    if pa.types.is_timestamp(t):
        return "ts", _ts_us
    return None


def file_zone_doc(path: str) -> dict | None:
    """Per-column zone statistics for one parquet file, from its FOOTER
    only (no data pages move). Returns ``{"rows": n, "cols": {name:
    zone}}`` where zone is one of:

    * ``{"x": 1}`` — statistics unavailable (nested / binary column, or
      the writer omitted min/max): never prunable;
    * ``{"r": rows, "n": nulls}`` with ``n == r`` — all-NULL column:
      prunable for every NULL-rejecting predicate;
    * ``{"r": rows, "n": nulls, "t": tag, "lo": v, "hi": v}`` — bounded.

    A top-level column ABSENT from ``cols`` means absent from the file
    (pre-evolution snapshot): the scan null-fills it, so it prunes like
    all-NULL. Returns None when the footer is unreadable (the caller
    records nothing; the file is then simply never skipped)."""
    try:
        pf = pq.ParquetFile(path)
    except Exception:
        return None
    md = pf.metadata
    leaf_of = {}  # top-level flat column name -> leaf index
    for i in range(md.num_columns):
        p = md.schema.column(i).path
        if "." not in p:
            leaf_of[p] = i
    cols: dict[str, dict] = {}
    for field in pf.schema_arrow:
        tn = _tag_and_norm(field.type)
        leaf = leaf_of.get(field.name)
        if tn is None or leaf is None:
            cols[field.name] = {"x": 1}
            continue
        tag, norm = tn
        rows = nulls = 0
        lo = hi = None
        unknown = False
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            rows += rg.num_rows
            st = rg.column(leaf).statistics
            nc = st.null_count if st is not None else None
            if nc is None:
                unknown = True
                break
            nulls += nc
            if nc == rg.num_rows:
                continue  # row group contributes no bounds
            if not st.has_min_max:
                unknown = True
                break
            try:
                gmin, gmax = norm(st.min), norm(st.max)
            except Exception:
                unknown = True
                break
            if gmin is None or gmax is None:
                unknown = True
                break
            lo = gmin if lo is None else min(lo, gmin)
            hi = gmax if hi is None else max(hi, gmax)
        if unknown:
            cols[field.name] = {"x": 1}
        elif lo is None:
            cols[field.name] = {"r": rows, "n": nulls}
        else:
            cols[field.name] = {"r": rows, "n": nulls, "t": tag,
                                "lo": lo, "hi": hi}
    return {"rows": md.num_rows, "cols": cols}


def _coerce_query_value(tag: str, value: Any):
    """Normalize a constraint VALUE into the zone's stored domain;
    None = incomparable (the zone then never prunes — the residual
    filter still applies the constraint exactly)."""
    try:
        if tag == "ts":
            return _ts_us(value)
        if tag == "i" or tag == "f":
            return value if isinstance(value, (int, float)) and not isinstance(value, bool) else None
        if tag == "s":
            return value if isinstance(value, str) else None
        if tag == "b":
            return value if isinstance(value, bool) else None
    except Exception:
        return None
    return None


def zone_allows(cols_doc: dict | None, col: str, op: str, *value) -> bool:
    """May this file contain a row satisfying ``col op value``?
    True = cannot prove empty (must read). SQL WHERE semantics: NULL
    never satisfies any listed op (including ``!=`` and ``not_in``), so
    an all-NULL / absent column is provably predicate-free."""
    if cols_doc is None:
        return True
    zone = cols_doc.get(col)
    if zone is None:
        return False  # column absent from file -> all-NULL after conform
    if "x" in zone:
        return True
    nonnull = zone["r"] - zone["n"]
    if nonnull <= 0 or "lo" not in zone:
        return False  # all-NULL column: no row matches any predicate
    if op == "not_null":
        return True
    if op == "matches":
        return True  # regex: bounds prove nothing
    lo, hi, tag = zone["lo"], zone["hi"], zone["t"]
    if op in ("in", "not_in"):
        vals = [_coerce_query_value(tag, x) for x in (value[0] or [])]
        if any(v is None for v in vals):
            return True
        if op == "in":
            return any(lo <= v <= hi for v in vals)
        return not (lo == hi and lo in vals)
    v = _coerce_query_value(tag, value[0]) if value else None
    if v is None:
        return True
    if op == "==":
        return lo <= v <= hi
    if op == "!=":
        return not (lo == hi == v)
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    return True


def routed_parts(manifest, constraints: list) -> set[int] | None:
    """Partitions a url point/membership constraint can touch, via the
    writer's own crc32 routing (split-map aware) — or None when no url
    equality constraint is present. Multiple url constraints
    intersect."""
    from .checkpoint import resolve_partition

    splits = manifest.split_set()
    out: set[int] | None = None
    for spec in constraints or []:
        if spec[0] != "url" or len(spec) < 3:
            continue
        if spec[1] == "==":
            urls = [spec[2]]
        elif spec[1] == "in":
            urls = list(spec[2])
        else:
            continue
        if not all(isinstance(u, str) for u in urls):
            continue
        parts = {
            resolve_partition(
                zlib.crc32(u.encode("utf-8")), manifest.num_partitions, splits
            )
            for u in urls
        }
        out = parts if out is None else (out & parts)
    return out


def plan_parts(
    manifest, constraints: list, blooms: dict | None = None
) -> tuple[list[int], dict]:
    """The scan plan: which partitions a constrained read must touch.
    A partition is skipped when hash routing excludes it, or when EVERY
    one of its files (base + MOR deltas) is proven predicate-free by
    some constraint's zone — or, for ``==``/``in`` predicates, by the
    file's entry in the optional BLOOM INDEX (``state.bloomindex``; a
    file with no entry is never skipped by bloom) — see module
    docstring for why the granularity is the partition, never the
    file."""
    constraints = [c for c in (constraints or []) if len(c) >= 2]
    all_parts = manifest.all_parts()
    routed = routed_parts(manifest, constraints)
    zones = getattr(manifest, "zones", {}) or {}
    bloom_files = (blooms or {}).get("files", {})
    kept: list[int] = []
    skipped_routing = skipped_zones = skipped_blooms = 0
    files_total = files_read = 0
    for part in all_parts:
        rels = manifest.part_files(part)
        files_total += len(rels)
        if routed is not None and part not in routed:
            skipped_routing += 1
            continue
        def _zone_empty(rel: str) -> bool:
            doc = zones.get(rel)
            if doc is None:
                return False
            cols = doc.get("cols", {})
            return any(
                not zone_allows(cols, c[0], c[1], *c[2:]) for c in constraints
            )
        def _bloom_empty(rel: str) -> bool:
            from .bloomindex import bloom_allows

            doc = bloom_files.get(rel)
            if doc is None:
                return False
            return any(
                not bloom_allows(doc, c[0], c[1], *c[2:])
                for c in constraints
            )
        if rels and constraints:
            if all(_zone_empty(r) for r in rels):
                skipped_zones += 1
                continue
            if bloom_files and all(
                _zone_empty(r) or _bloom_empty(r) for r in rels
            ):
                skipped_blooms += 1
                continue
        kept.append(part)
        files_read += len(rels)
    return kept, {
        "parts_total": len(all_parts),
        "parts_read": len(kept),
        "skipped_by_routing": skipped_routing,
        "skipped_by_zones": skipped_zones,
        "skipped_by_blooms": skipped_blooms,
        "files_total": files_total,
        "files_read": files_read,
    }


def constraints_to_expression(
    constraints: list, schema: pa.Schema | None
):
    """Compile the constraint triples into ONE ``pyarrow.compute``
    dataset expression — applied on every scan output regardless of
    pruning (statistics accelerate, the expression decides). Timestamp
    values are coerced against the lake schema so ISO strings from the
    CLI compare correctly."""
    import pyarrow.compute as pc

    expr = None
    for spec in constraints or []:
        col, op = spec[0], spec[1]
        if op not in PREDICATE_OPS:
            raise ValueError(f"unknown predicate op: {op!r}")
        f = pc.field(col)
        value = spec[2] if len(spec) > 2 else None
        t = None
        if schema is not None:
            try:
                t = schema.field(col).type
            except KeyError:
                t = None
        if t is not None and pa.types.is_timestamp(t) and value is not None:
            if op in ("in", "not_in"):
                value = [pa.scalar(_us_dt(x), t) for x in value]
            else:
                value = pa.scalar(_us_dt(value), t)
        if op == "==":
            e = f == value
        elif op == "!=":
            e = f != value
        elif op == "<":
            e = f < value
        elif op == "<=":
            e = f <= value
        elif op == ">":
            e = f > value
        elif op == ">=":
            e = f >= value
        elif op == "in":
            e = f.isin(value)
        elif op == "not_in":
            # SQL WHERE semantics: NULL NOT IN (...) is NULL -> false.
            # Arrow's is_in maps null -> false, so a bare invert would
            # KEEP null rows; reject them explicitly (the hypothesis
            # soundness law caught exactly this divergence).
            e = (~f.isin(value)) & f.is_valid()
        elif op == "not_null":
            e = f.is_valid()
        else:  # matches
            e = pc.match_substring_regex(f, value)
        expr = e if expr is None else (expr & e)
    return expr


def _us_dt(v: Any) -> datetime:
    """Constraint value -> datetime for a timestamp column comparison."""
    us = _ts_us(v)
    if us is None:
        raise ValueError(f"not a timestamp value: {v!r}")
    return datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)


def refresh_zones(lake_dir: str, manifest, prev_zones: dict | None) -> dict:
    """Commit-time zone maintenance: carry forward statistics for every
    still-live relpath (files are immutable — stats never go stale) and
    read the FOOTER of each newly added file. O(new files) per commit;
    deterministic (sorted paths, pure function of immutable bytes), so
    a crashed-and-retried commit rebuilds byte-identical zones."""
    prev = prev_zones or {}
    seeded = getattr(manifest, "zones", None) or {}
    live = manifest.all_data_relpaths()
    out: dict = {}
    for rel in sorted(live):
        doc = seeded.get(rel) or prev.get(rel)
        if doc is None:
            doc = file_zone_doc(os.path.join(lake_dir, rel))
        if doc is not None:
            out[rel] = doc
    return out
