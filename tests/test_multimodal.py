"""Multimodal plumbing: schema contract, actor-pool decode stages with
the deterministic fake decoder; real decoders raise NotImplementedError."""
import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.stages.multimodal import (
    DecodeImageMetadata,
    MEDIA_SCHEMA,
    ResizeImage,
    SampleFrames,
    embed_fake,
    make_fake_image,
)


def _media_table(n=20):
    rows = []
    for i in range(n):
        rows.append(
            {
                "media_id": i,
                "url": f"https://site-{i}.example/img.png",
                "kind": "image" if i % 3 else "video",
                "payload": make_fake_image(64 + i, 48 + i, 3, fill=i),
                "content_type": "image/png",
            }
        )
    rows.append({"media_id": n, "url": "u", "kind": "image",
                 "payload": b"corrupt", "content_type": "image/png"})
    rows.append({"media_id": n + 1, "url": "u2", "kind": "image",
                 "payload": None, "content_type": None})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def test_decode_metadata_actor_pool():
    ds = ray.data.from_arrow(_media_table())
    out = ds.map_batches(
        DecodeImageMetadata,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["width"] == 64 and by_id[0]["height"] == 48
    assert by_id[5]["width"] == 69
    assert by_id[20]["width"] is None  # corrupt payload -> null metadata
    assert by_id[21]["width"] is None  # null payload
    assert "payload" not in out[0]  # payload dropped early


def test_real_decoder_is_stubbed():
    dec = DecodeImageMetadata(decoder="real")
    with pytest.raises(NotImplementedError):
        dec(_media_table(2))
    with pytest.raises(ValueError):
        DecodeImageMetadata(decoder="bogus")


def test_resize_rewrites_header():
    ds = ray.data.from_arrow(_media_table(5))
    out = ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"width": 32, "height": 24},
        batch_format="pyarrow",
        concurrency=1,
    ).map_batches(
        DecodeImageMetadata, fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    ok = [r for r in out if r["width"] is not None]
    assert ok and all(r["width"] == 32 and r["height"] == 24 for r in ok)


def test_sample_frames_flatmap_shape():
    ds = ray.data.from_arrow(_media_table(4))
    out = ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_n": 5, "max_frames": 3},
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert len(out) == 6 * 3  # 6 media rows x 3 frames
    frames = sorted({r["frame_index"] for r in out})
    assert frames == [0, 5, 10]


def test_embed_fake_deterministic():
    t = _media_table(3)
    a = embed_fake(t, dim=8).column("embedding").to_pylist()
    b = embed_fake(t, dim=8).column("embedding").to_pylist()
    assert a == b
    assert len(a[0]) == 8
