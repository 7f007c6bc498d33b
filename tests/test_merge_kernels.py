"""Unit tests for the merge stage's vectorized kernels: the crc32
partitioner must stay byte-identical to ``zlib.crc32`` forever (the
partition -> base-file routing contract), and the spill path must
tolerate empty blocks."""
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from data_hub_ejp_xml_pipeline_ray.stages.merge import (
    SpillCombiner,
    crc32_column,
    stable_hash_partition,
)


def _ref_crc(strings):
    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in strings], dtype=np.uint32
    )


def test_crc32_column_matches_zlib_row_for_row():
    urls = [
        "https://site-0.example/p/0001",
        "",  # empty string
        "a",
        "https://site-99.example/x/" + "y" * 300,  # long tail
        "unicode-éü-path",  # multi-byte utf-8
        "https://site-1.example/p/0002",
    ]
    got = crc32_column(pa.array(urls, pa.string()))
    np.testing.assert_array_equal(got, _ref_crc(urls))


def test_crc32_column_handles_sliced_and_chunked_arrays():
    urls = [f"https://site-{i}.example/p/{i:04d}" for i in range(50)]
    arr = pa.array(urls, pa.string())
    sl = arr.slice(7, 31)
    np.testing.assert_array_equal(crc32_column(sl), _ref_crc(urls[7:38]))
    chunked = pa.chunked_array([arr.slice(0, 20), arr.slice(20)])
    np.testing.assert_array_equal(crc32_column(chunked), _ref_crc(urls))


def test_crc32_column_large_string_type():
    urls = ["x", "yy", "zzz"]
    got = crc32_column(pa.array(urls, pa.large_string()))
    np.testing.assert_array_equal(got, _ref_crc(urls))


def test_stable_hash_partition_matches_reference_modulo():
    urls = [f"https://site-{i}.example/p/{i:04d}" for i in range(200)]
    parts = stable_hash_partition(pa.array(urls), 64).to_pylist()
    assert parts == [zlib.crc32(u.encode()) % 64 for u in urls]


def test_spill_combiner_empty_batch(tmp_path):
    """A 0-row block must spill nothing and return an empty manifest
    table (regression: IndexError on parts_np[s] of an empty array)."""
    schema = pa.schema(
        [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
         ("seq", pa.int64()), ("text", pa.string())]
    )
    sc = SpillCombiner(str(tmp_path / "staging"), num_partitions=8)
    out = sc.split_and_spill(schema.empty_table())
    assert out.num_rows == 0
    assert out.column_names == ["part", "rows", "path", "row_group"]
    # also via the combining __call__ path
    out2 = sc(schema.empty_table())
    assert out2.num_rows == 0


def test_spill_file_name_is_content_addressed(tmp_path):
    """Same batch content -> same spill file name (idempotent retry);
    different content -> different name."""
    import datetime as dt

    def batch(urls, seqs):
        return pa.table(
            {"url": pa.array(urls),
             "warc_ts": pa.array([dt.datetime(2025, 1, 1)] * len(urls),
                                 pa.timestamp("us")),
             "seq": pa.array(seqs, pa.int64()),
             "text": pa.array(["t"] * len(urls))}
        )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    sc1, sc2 = SpillCombiner(d1, 8), SpillCombiner(d2, 8)
    p1 = set(sc1.split_and_spill(batch(["u1", "u2"], [1, 2])).column("path").to_pylist())
    p2 = set(sc2.split_and_spill(batch(["u1", "u2"], [1, 2])).column("path").to_pylist())
    assert {p.split("/")[-1] for p in p1} == {p.split("/")[-1] for p in p2}
    p3 = set(sc2.split_and_spill(batch(["u1", "u3"], [1, 2])).column("path").to_pylist())
    assert {p.split("/")[-1] for p in p1} != {p.split("/")[-1] for p in p3}


def test_vectorized_partitioner_agrees_with_scalar_resolver_under_splits():
    from data_hub_ejp_xml_pipeline_ray.state.checkpoint import resolve_partition

    urls = [f"https://u{i}.example/{i%7}" for i in range(500)]
    P = 8
    splits = frozenset({(3, 8), (3, 16), (5, 8), (11, 16)})
    vec = stable_hash_partition(pa.array(urls), P, splits).to_pylist()
    for u, got in zip(urls, vec):
        crc = zlib.crc32(u.encode())
        assert got == resolve_partition(crc, P, splits)
