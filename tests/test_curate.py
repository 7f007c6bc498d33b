"""Curation pipeline: filter prefix vs SQL-style expectations, drop-set
correctness, end-to-end survivors and partitioned output."""
import os

import pyarrow as pa
import ray.data

from data_hub_ejp_xml_pipeline_ray.functions import textstats as ts
from data_hub_ejp_xml_pipeline_ray.pipelines.curate import (
    annotate_and_filter,
    curate,
)
from data_hub_ejp_xml_pipeline_ray.stages.dedup import exact_dedup, exact_dedup_drop_ids


def _docs():
    rows = [
        {"doc_id": 0, "text": "the quick brown fox and the lazy dog of to is " * 8},
        {"doc_id": 1, "text": "the quick brown fox and the lazy dog of to is " * 8},  # exact dup
        {"doc_id": 2, "text": "der hund und die katze ist ein tier " * 10},
        {"doc_id": 3, "text": "xyzzy plugh"},                                   # low quality, und
        {"doc_id": 4, "text": "the data lake of the and to is stream " * 9},
        {"doc_id": 5, "text": "the data lake of the and to is stream river " * 9},  # near dup of 4
        {"doc_id": 6, "text": ""},                                              # empty
    ]
    return rows


def test_annotate_and_filter_matches_kernels():
    rows = _docs()
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = annotate_and_filter(ds, quality_threshold=0.3).take_all()
    kept = {r["doc_id"] for r in out}
    # recompute expectations straight from the kernels
    arr = pa.array([r["text"] for r in rows])
    import pyarrow.compute as pc
    lower = pc.utf8_lower(arr)
    q = ts.quality_score(
        ts.token_count(arr), ts.char_count(arr), ts.punct_count(arr),
        ts.stopword_count(lower),
    ).to_pylist()
    langs = ts.lang_id(arr).to_pylist()
    expected = {
        r["doc_id"]
        for r, qq, lg in zip(rows, q, langs)
        if qq >= 0.3 and lg in ("en", "de", "fr", "es")
    }
    assert kept == expected
    assert 3 not in kept and 6 not in kept


def test_exact_drop_ids_complements_survivors():
    rows = _docs()
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    survivors = {r["doc_id"] for r in exact_dedup(ds).take_all()}
    drop = exact_dedup_drop_ids(ds)
    assert survivors | drop == {r["doc_id"] for r in rows}
    assert survivors & drop == set()
    assert 1 in drop  # the exact dup loses to doc 0


def test_curate_end_to_end(tmp_path):
    rows = _docs()
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out_dir = str(tmp_path / "curated")
    out = curate(ds, quality_threshold=0.3, near_dup_threshold=0.5,
                 output_dir=out_dir)
    kept = sorted(r["doc_id"] for r in out.take_all())
    # 1 drops (exact dup of 0); 5 drops (near dup of 4); 3/6 filtered
    assert 0 in kept and 4 in kept and 2 in kept
    assert 1 not in kept and 5 not in kept and 3 not in kept and 6 not in kept
    # partitioned layout on disk
    assert any(name.startswith("bucket=") for name in os.listdir(out_dir))


def test_write_training_shards_resumable_and_matches_assignments(
    tmp_path, monkeypatch
):
    """The shard writer lays out shard=<k>/range-<rb>.parquet with
    every doc exactly once, shard assignment identical to the packing
    operator, and a re-run after deleting one range's marker rewrites
    ONLY that range."""
    import glob
    import os

    import pyarrow.parquet as pq

    from data_hub_ejp_xml_pipeline_ray.pipelines.curate import (
        write_training_shards,
    )
    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import (
        q_pack_token_shards,
    )

    import data_hub_ejp_xml_pipeline_ray.pipelines.queries as Q

    # shrink the range size so the smoke tier spans MULTIPLE ranges
    # (shard assignment is independent of the bucketing, so the writer
    # and the assignment operator stay consistent under the patch)
    monkeypatch.setattr(Q, "PACK_RANGE_DOCS", 20)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    r = write_training_shards(sf, out)
    assert r["ranges_skipped"] == 0 and r["rows_written"] > 0
    assert r["ranges_written"] >= 3  # multi-range resume is exercised

    files = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    assert files
    got = pa.concat_tables([pq.read_table(f) for f in files])
    expect = q_pack_token_shards(sf).to_pandas().set_index("doc_id")
    assert got.num_rows == len(expect)  # every doc exactly once
    for did, sid, nt in zip(
        got.column("doc_id").to_pylist(),
        got.column("shard_id").to_pylist(),
        got.column("n_tokens").to_pylist(),
    ):
        assert expect.loc[did, "shard_id"] == sid
        assert expect.loc[did, "n_tokens"] == nt

    # idempotent full skip
    r2 = write_training_shards(sf, out)
    assert r2["ranges_written"] == 0 and r2["ranges_skipped"] > 0

    # resume: drop one range's marker -> exactly that range rewrites
    markers = sorted(glob.glob(os.path.join(out, "_range-*.done.json")))
    os.remove(markers[0])
    before_mtimes = {
        f: os.path.getmtime(f)
        for f in files if "range-000000" not in f
    }
    r3 = write_training_shards(sf, out)
    assert r3["ranges_written"] == 1
    for f, m in before_mtimes.items():
        assert os.path.getmtime(f) == m  # untouched ranges not rewritten
