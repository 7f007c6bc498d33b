"""Schema union + widen rules (parity with the reference's recursive
schema merge where the existing definition wins on conflict,
``bq_data_service.py:142-188``)."""
import pyarrow as pa

from data_hub_ejp_xml_pipeline_ray.schemas import (
    conform_table,
    merge_schemas,
    merge_types,
    schema_from_json,
    schema_to_json,
)


def test_column_add():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.int64()), ("y", pa.string())])
    m = merge_schemas(a, b)
    assert m.names == ["x", "y"]


def test_existing_order_preserved_new_appended():
    a = pa.schema([("b", pa.int64()), ("a", pa.string())])
    b = pa.schema([("a", pa.string()), ("c", pa.float64()), ("b", pa.int64())])
    assert merge_schemas(a, b).names == ["b", "a", "c"]


def test_int_widen_both_directions():
    assert merge_types(pa.int32(), pa.int64()) == pa.int64()
    assert merge_types(pa.int64(), pa.int32()) == pa.int64()
    assert merge_types(pa.float32(), pa.float64()) == pa.float64()


def test_conflict_existing_wins():
    assert merge_types(pa.string(), pa.int64()) == pa.string()
    assert merge_types(pa.int64(), pa.float64()) == pa.int64()


def test_null_yields_to_anything():
    assert merge_types(pa.null(), pa.string()) == pa.string()
    assert merge_types(pa.string(), pa.null()) == pa.string()


def test_struct_recursive_add():
    a = pa.schema([("s", pa.struct([("x", pa.int32())]))])
    b = pa.schema([("s", pa.struct([("x", pa.int64()), ("y", pa.string())]))])
    m = merge_schemas(a, b)
    st = m.field("s").type
    assert st.field("x").type == pa.int64()
    assert st.field("y").type == pa.string()


def test_list_recursive():
    a = pa.schema([("l", pa.list_(pa.int32()))])
    b = pa.schema([("l", pa.list_(pa.int64()))])
    assert merge_schemas(a, b).field("l").type == pa.list_(pa.int64())


def test_conform_table_null_fill_and_cast():
    schema = pa.schema([("x", pa.int64()), ("y", pa.string())])
    t = pa.table({"x": pa.array([1, 2], type=pa.int32()), "z": ["drop", "me"]})
    out = conform_table(t, schema)
    assert out.schema.equals(schema)
    assert out.column("y").null_count == 2
    assert out.column("x").to_pylist() == [1, 2]


def test_schema_serde_roundtrip():
    s = pa.schema([("u", pa.string()), ("t", pa.timestamp("us", tz="UTC"))])
    assert schema_from_json(schema_to_json(s)).equals(s)


def test_merge_schemas_pins_reserved_trailing_columns():
    import pyarrow as pa

    from data_hub_ejp_xml_pipeline_ray.schemas import merge_schemas

    existing = pa.schema([
        ("url", pa.string()), ("seq", pa.int64()),
        ("_src_segment", pa.string()), ("_deleted", pa.bool_()),
    ])
    new = pa.schema([
        ("url", pa.string()), ("seq", pa.int64()),
        ("content_type", pa.string()),  # evolution-added column
    ])
    merged = merge_schemas(existing, new)
    # the added column lands BEFORE the engine-reserved trailing pair,
    # matching where a single-shot replay would put it
    assert merged.names == [
        "url", "seq", "content_type", "_src_segment", "_deleted"
    ]
