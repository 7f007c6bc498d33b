"""Multimodal column stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The decode kernels themselves require codec libraries that are NOT in
this environment, so they are stubbed behind ``decoder='fake'`` (a
deterministic header-parsing fake used by the tests) or
``decoder='real'`` (raises ``NotImplementedError`` with the dependency
named). Everything Ray-side — schema contract, batch sizing for large
binary payloads, actor-pool state, output layout — is real and tested.

Scale note: binary payloads dominate block size; these stages are meant
to run with a small ``batch_size`` (rows) and ``batch_format='pyarrow'``
so the bytes stay zero-copy in the object store until the decode touches
them, and metadata-only outputs drop the payload column immediately.
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

#: Canonical multimodal table schema: payload + typed metadata.
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("content_type", pa.string()),
    ]
)

#: Deterministic fake payload header: magic, width, height, channels.
_FAKE_MAGIC = b"FAKE"
_FAKE_HDR = struct.Struct("<4sHHB")


def make_fake_image(width: int, height: int, channels: int = 3, fill: int = 0) -> bytes:
    """Test/bench payload builder: header + deterministic pixel bytes."""
    body = bytes(((fill + i) % 256) for i in range(min(width * height * channels, 256)))
    return _FAKE_HDR.pack(_FAKE_MAGIC, width, height, channels) + body


class DecodeImageMetadata:
    """Actor-pool stage: payload bytes -> (width, height, channels).

    ``decoder='real'`` would use PIL/opencv — unavailable here, so it
    raises ``NotImplementedError`` naming the dependency; the
    deterministic ``'fake'`` decoder parses the FAKE header so the full
    Ray plumbing is exercised end-to-end.
    """

    def __init__(self, decoder: str = "fake", drop_payload: bool = True):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._decoder = decoder
        self._drop_payload = drop_payload

    def _decode_one(self, payload: bytes | None) -> tuple[int | None, int | None, int | None]:
        if payload is None:
            return (None, None, None)
        if self._decoder == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv, not available in this "
                "environment; use decoder='fake'"
            )
        if len(payload) < _FAKE_HDR.size or payload[:4] != _FAKE_MAGIC:
            return (None, None, None)  # undecodable -> null metadata
        _, w, h, c = _FAKE_HDR.unpack(payload[: _FAKE_HDR.size])
        return (int(w), int(h), int(c))

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = [self._decode_one(p) for p in batch.column("payload").to_pylist()]
        batch = batch.append_column("width", pa.array([m[0] for m in meta], pa.int32()))
        batch = batch.append_column("height", pa.array([m[1] for m in meta], pa.int32()))
        batch = batch.append_column("channels", pa.array([m[2] for m in meta], pa.int32()))
        if self._drop_payload:
            batch = batch.drop_columns(["payload"])
        return batch


class ResizeImage:
    """Actor-pool stage contract for resize: fake decoder rewrites the
    header dims (payload passthrough); real decoder is stubbed."""

    def __init__(self, width: int, height: int, decoder: str = "fake"):
        self._w = width
        self._h = height
        self._decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._decoder == "real":
            raise NotImplementedError("real resize requires an image library")
        out = []
        for p in batch.column("payload").to_pylist():
            if p is None or len(p) < _FAKE_HDR.size or p[:4] != _FAKE_MAGIC:
                out.append(p)
                continue
            _, _, _, c = _FAKE_HDR.unpack(p[: _FAKE_HDR.size])
            out.append(_FAKE_HDR.pack(_FAKE_MAGIC, self._w, self._h, c) + p[_FAKE_HDR.size :])
        return batch.set_column(
            batch.column_names.index("payload"), "payload", pa.array(out, pa.binary())
        )


class SampleFrames:
    """Video frame-sampling contract: emits ``frame_index`` rows per
    media row (flat-map shape), payload decode stubbed like above."""

    def __init__(self, every_n: int = 10, max_frames: int = 4, decoder: str = "fake"):
        self._every_n = every_n
        self._max = max_frames
        self._decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._decoder == "real":
            raise NotImplementedError("real frame sampling requires a video library")
        ids, urls, frames = [], [], []
        for mid, url in zip(
            batch.column("media_id").to_pylist(), batch.column("url").to_pylist()
        ):
            for f in range(self._max):
                ids.append(mid)
                urls.append(url)
                frames.append(f * self._every_n)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "frame_index": pa.array(frames, pa.int32()),
            }
        )


def embed_fake(batch: pa.Table, dim: int = 16) -> pa.Table:
    """Deterministic fake feature-extraction: seeded-by-content vectors
    (stable across runs) — stands in for a model-inference actor pool."""
    vecs = []
    ids = batch.column("media_id").to_pylist()
    for i in ids:
        rng = np.random.default_rng(int(i) + 1)
        vecs.append(rng.standard_normal(dim).astype(np.float32))
    return batch.append_column(
        "embedding", pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
    )
