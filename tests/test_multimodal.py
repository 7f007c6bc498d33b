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


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


_HAS_PIL = _has("PIL.Image")
_HAS_CV2 = _has("cv2")


@pytest.mark.skipif(_HAS_PIL, reason="PIL installed: real branch active")
def test_real_decoder_fails_fast_without_pil():
    # fail-fast at ACTOR INIT (once per actor), dependency named
    with pytest.raises(NotImplementedError, match="Pillow"):
        DecodeImageMetadata(decoder="real")
    with pytest.raises(NotImplementedError, match="Pillow"):
        ResizeImage(4, 4, decoder="real")


@pytest.mark.skipif(_HAS_CV2, reason="cv2 installed: real branch active")
def test_real_frame_sampler_fails_fast_without_cv2():
    with pytest.raises(NotImplementedError, match="opencv"):
        SampleFrames(decoder="real")


def test_bogus_decoder_rejected():
    with pytest.raises(ValueError):
        DecodeImageMetadata(decoder="bogus")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_decode_and_resize_with_pil():
    # real-codec branch: PIL-generated PNG -> decode metadata -> resize
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "url": pa.array(["u1", "u2"]),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([png, b"not-an-image"], pa.binary()),
        "content_type": pa.array(["image/png", "image/png"]),
    })
    out = DecodeImageMetadata(decoder="real", drop_payload=False)(tbl)
    assert out.column("width").to_pylist() == [20, None]
    assert out.column("height").to_pylist() == [10, None]
    assert out.column("channels").to_pylist() == [3, None]
    resized = ResizeImage(4, 6, decoder="real")(tbl)
    img = Image.open(io.BytesIO(resized.column("payload")[0].as_py()))
    assert img.size == (4, 6)
    # undecodable payload passes through unchanged
    assert resized.column("payload")[1].as_py() == b"not-an-image"


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
