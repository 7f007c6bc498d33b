"""WAL tailer semantics: glob + exclusion + strictly-greater watermark
(parity with ``airflow_s3_util_extension.py:101-138`` incl. the
``:130-133`` strict comparison), and schema-unified multi-version read."""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from data_hub_ejp_xml_pipeline_ray.sources.synthetic import generate_wal
from data_hub_ejp_xml_pipeline_ray.sources.wal import (
    list_segments,
    read_segments,
    segments_after,
    unified_wire_schema,
)


def _touch_parquet(path):
    pq.write_table(pa.table({"x": [1]}), path)


def test_list_sorted_glob_and_exclusion(tmp_path):
    d = str(tmp_path)
    for name in ["segment-00002.parquet", "segment-00000.parquet", "other.parquet",
                 "segment-00001.parquet", "segment-bad.tmp"]:
        _touch_parquet(os.path.join(d, name))
    segs = list_segments(d)
    assert [s.name for s in segs] == [
        "segment-00000.parquet", "segment-00001.parquet", "segment-00002.parquet"
    ]
    segs = list_segments(d, exclusion_pattern=r"segment-00001")
    assert [s.name for s in segs] == ["segment-00000.parquet", "segment-00002.parquet"]


def test_watermark_strictly_greater(tmp_path):
    d = str(tmp_path)
    for i in range(3):
        _touch_parquet(os.path.join(d, f"segment-{i:05d}.parquet"))
    segs = list_segments(d)
    assert [s.name for s in segments_after(segs, None)] == [s.name for s in segs]
    after = segments_after(segs, "segment-00001.parquet")
    assert [s.name for s in after] == ["segment-00002.parquet"]  # == watermark skipped


def test_missing_dir_is_empty():
    assert list_segments("/tmp/does/not/exist") == []


def test_unified_read_across_schema_versions(tmp_path):
    d = os.path.join(str(tmp_path), "wal")
    generate_wal(d, seed=3, n_urls=10, n_events=100, n_segments=4, v2_from_segment=2)
    segs = list_segments(d)
    wire = unified_wire_schema(segs)
    assert wire.field("fetch_status").type == pa.int64()  # widened
    assert "content_type" in wire.names
    ds = read_segments(segs, wire)
    table = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")), promote_options="default"
    )
    assert table.num_rows == 100
    # v1 rows present with null content_type under the unified schema
    assert table.column("content_type").null_count > 0
