"""Arrow schemas for the page lake and the change-event WAL, plus the
schema-evolution (union + widen) rules applied at merge time.

The reference infers warehouse schemas from staged JSONL and merges them
into the live table schema with a recursive field-union where the
*existing* field definition wins on conflict
(``ejp_xml_pipeline/data_store/bq_data_service.py:142-188,204-231``).
We reproduce those semantics over Arrow types, with an explicit widen
table (int -> wider int, float32 -> float64, null -> anything) layered on
top — the two evolution paths (column add at any depth, declared numeric
widen) the engine supports.
"""
from __future__ import annotations

import base64

import pyarrow as pa

# ---------------------------------------------------------------------------
# Canonical schemas (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Base lake table of web pages. ``url`` is the primary key; ``warc_ts``
#: is the LWW ordering key; ``seq`` the per-key monotonic tiebreak kept in
#: the lake so future same-``warc_ts`` events merge deterministically.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("seq", pa.int64()),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

#: Change-event WAL segment schema (v1). ``op`` is insert|update|delete.
EVENTS_SCHEMA_V1 = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("seq", pa.int64()),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
        pa.field("schema_version", pa.int32()),
        pa.field("fetch_status", pa.int32()),
    ]
)

#: v2 adds ``content_type`` (column add) and widens ``fetch_status`` to
#: int64 (declared numeric widen) — the two evolution paths exercised by
#: FIXTURES.md §4.
EVENTS_SCHEMA_V2 = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("seq", pa.int64()),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
        pa.field("schema_version", pa.int32()),
        pa.field("fetch_status", pa.int64()),
        pa.field("content_type", pa.string()),
    ]
)

# Columns that exist only on the wire, never in the lake.
WIRE_ONLY_COLUMNS = ("op", "html", "schema_version")

# ---------------------------------------------------------------------------
# Schema union + widen
# ---------------------------------------------------------------------------

_INT_RANK = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}
_UINT_RANK = {
    pa.uint8(): 0,
    pa.uint16(): 1,
    pa.uint32(): 2,
    pa.uint64(): 3,
}
_FLOAT_RANK = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def merge_types(existing: pa.DataType, new: pa.DataType) -> pa.DataType:
    """Merge a field type seen in new data into the existing lake type.

    Mirrors the reference's precedence — the existing definition wins on
    conflict (``bq_data_service.py:155-158``) — except for the declared
    widens: null -> anything, smaller int -> larger int of the same
    signedness, smaller float -> larger float. Struct and list types are
    merged recursively (column add at any nesting depth, matching the
    recursive schema-union at ``bq_data_service.py:142-188``).
    """
    if existing.equals(new):
        return existing
    if pa.types.is_null(existing):
        return new
    if pa.types.is_null(new):
        return existing
    if pa.types.is_struct(existing) and pa.types.is_struct(new):
        return pa.struct(_merge_fields(list(existing), list(new)))
    if (
        pa.types.is_large_list(existing) or pa.types.is_list(existing)
    ) and (pa.types.is_large_list(new) or pa.types.is_list(new)):
        return pa.list_(merge_types(existing.value_type, new.value_type))
    for rank in (_INT_RANK, _UINT_RANK, _FLOAT_RANK):
        if existing in rank and new in rank:
            return existing if rank[existing] >= rank[new] else new
    # Everything else: existing wins (no type rewrite on conflict).
    return existing


def _merge_fields(existing: list[pa.Field], new: list[pa.Field]) -> list[pa.Field]:
    by_name = {f.name: f for f in existing}
    out: list[pa.Field] = []
    for f in existing:
        match = next((g for g in new if g.name == f.name), None)
        if match is None:
            out.append(f)
        else:
            out.append(pa.field(f.name, merge_types(f.type, match.type)))
    for g in new:
        if g.name not in by_name:
            out.append(g)
    return out


#: Engine-reserved columns that must stay TRAILING through schema
#: evolution (names mirror stages/merge.py — kept literal here to avoid
#: a circular import). Without this, a column added by a later segment
#: lands AFTER the provenance/tombstone fields in an incrementally
#: evolved lake but BEFORE them in a single-shot replay — same data,
#: different column order, and replay-equals-incremental byte equality
#: breaks.
_TRAILING_COLUMNS = ("_src_segment", "_deleted")


def merge_schemas(existing: pa.Schema | None, new: pa.Schema) -> pa.Schema:
    """Union two schemas: existing field order preserved, new-only fields
    appended, types merged per :func:`merge_types`. Engine-reserved
    trailing columns are re-pinned to the end so evolved and replayed
    lakes agree on column order."""
    if existing is None:
        return new
    merged = _merge_fields(list(existing), list(new))
    head = [f for f in merged if f.name not in _TRAILING_COLUMNS]
    tail = [f for f in merged if f.name in _TRAILING_COLUMNS]
    return pa.schema(head + tail)


def unify_many(schemas: list[pa.Schema]) -> pa.Schema:
    """Fold :func:`merge_schemas` over a list (first = most senior)."""
    if not schemas:
        raise ValueError("no schemas to unify")
    out = schemas[0]
    for s in schemas[1:]:
        out = merge_schemas(out, s)
    return out


def conform_array(col: pa.ChunkedArray | pa.Array, target: pa.DataType) -> pa.Array:
    """Conform an array to ``target``, recursing into struct/list types
    (NESTED column-add: a struct gains a field -> old rows null-fill it
    inside every element). pyarrow's ``cast`` rejects struct widening
    ("struct fields don't match"), so nested evolution is rebuilt here
    from the child arrays — validity and list offsets preserved
    buffer-for-buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type.equals(target):
        return col
    if pa.types.is_struct(col.type) and pa.types.is_struct(target):
        have = {f.name for f in col.type}
        children = []
        for f in target:
            if f.name in have:
                children.append(conform_array(col.field(f.name), f.type))
            else:
                children.append(pa.nulls(len(col), f.type))
        mask = col.is_null() if col.null_count else None
        return pa.StructArray.from_arrays(
            children, fields=list(target), mask=mask
        )
    if (
        pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
    ) and (pa.types.is_list(target) or pa.types.is_large_list(target)):
        child = conform_array(col.values, target.value_type)
        return pa.Array.from_buffers(
            pa.list_(child.type) if pa.types.is_list(target) else pa.large_list(child.type),
            len(col),
            col.buffers()[:2],
            null_count=col.null_count,
            offset=col.offset,
            children=[child],
        )
    return col.cast(target)


def conform_table(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: missing columns null-filled, extra
    columns dropped, compatible types cast — recursively for nested
    struct/list columns (:func:`conform_array`). This is the read-side
    half of schema evolution (old lake partitions read under the
    unified schema)."""
    cols = []
    n = table.num_rows
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = conform_array(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


# ---------------------------------------------------------------------------
# Rename-log helpers (metadata-only schema evolution, pipelines/ddl.py)
# ---------------------------------------------------------------------------
#
# The manifest carries an APPEND-ONLY rename log ``[[old, new], ...]``
# (column renames are metadata-only commits: no data file is rewritten,
# the Iceberg/Delta column-mapping idea expressed over names instead of
# field ids). Files written before a rename still store the column
# under its old name, so every FILE-SOURCED table must pass through
# :func:`apply_renames` before :func:`conform_table`. Name-based
# mapping is sound because ``pipelines.ddl.alter_lake`` refuses any
# operation that would make a historical name ambiguous (re-adding a
# dropped column, renaming onto a used alias).


def alias_names(name: str, renames: list) -> list[str]:
    """Every historical (pre-rename) physical name that may hold data
    for logical column ``name``, oldest first, ``name`` itself last.
    Walks the rename log backward: ``a->b`` then ``b->c`` makes
    ``c``'s aliases ``[a, b, c]``."""
    out = [name]
    for old, new in reversed([(r[0], r[1]) for r in renames or ()]):
        if new == out[0]:
            out.insert(0, old)
    return out


def physical_read_columns(names: list[str], renames: list) -> list[str]:
    """The physical column names a pruned parquet read must request so
    files written under ANY historical schema contribute their data
    for the logical ``names`` (requested order preserved, aliases
    appended)."""
    out = list(names)
    seen = set(out)
    for n in names:
        for a in alias_names(n, renames):
            if a not in seen:
                seen.add(a)
                out.append(a)
    return out


def apply_renames(table: pa.Table, renames: list | None) -> pa.Table:
    """Apply the manifest rename log to a file-sourced table: a column
    still present under a pre-rename name is renamed in log order; if
    BOTH names are present (a pruned read that requested the alias
    explicitly null-fills it on new files, and vice versa), the newer
    name wins where non-null (coalesce) — each physical row stores the
    value under exactly one of the names."""
    if not renames:
        return table
    import pyarrow.compute as pc

    for pair in renames:
        old, new = pair[0], pair[1]
        names = table.column_names
        if old not in names:
            continue
        if new not in names:
            table = table.rename_columns(
                [new if c == old else c for c in names]
            )
            continue
        i_new = names.index(new)
        tgt = table.column(new)
        src = conform_array(table.column(old), tgt.type)
        merged = pc.if_else(pc.is_valid(tgt), tgt, src)
        table = table.set_column(
            i_new, pa.field(new, tgt.type), merged
        ).drop_columns([old])
    return table


def evolve_wire_schema(
    schema: pa.Schema, renames: list | None, dropped: list | None
) -> pa.Schema:
    """Project a WIRE-derived lake schema through the lake's DDL state
    before the ingest union: columns arriving under a pre-rename name
    are renamed to their live name (a producer that still emits the
    old name keeps working after an ``alter_lake`` rename), and
    columns the lake DROPPED are removed so the schema union can never
    resurrect them."""
    if not renames and not dropped:
        return schema
    resolve: dict[str, str] = {}
    for pair in renames or ():
        old, new = pair[0], pair[1]
        # chain-resolve: a->b recorded, then b->c — wire 'a' lands at 'c'
        for k, v in list(resolve.items()):
            if v == old:
                resolve[k] = new
        resolve[old] = new
    gone = set(dropped or ())
    fields: list[pa.Field] = []
    seen: set[str] = set()
    for f in schema:
        name = resolve.get(f.name, f.name)
        if name in gone or name in seen:
            continue
        seen.add(name)
        fields.append(pa.field(name, f.type))
    return pa.schema(fields)


# ---------------------------------------------------------------------------
# Schema (de)serialization for the manifest
# ---------------------------------------------------------------------------

def schema_to_json(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_json(data: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(data)))
