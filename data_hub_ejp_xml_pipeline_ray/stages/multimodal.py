"""Multimodal column stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

Decode kernels come in two flavors per stage: ``decoder='fake'`` (a
deterministic header-parsing fake — always available, used by the
oracle-checked tests) and ``decoder='real'`` — implemented against
PIL / opencv behind an import-try: when the library is present the
real codec runs; when absent (this container ships neither) the stage
raises ``NotImplementedError`` naming the dependency at ACTOR INIT
(fail-fast, once per actor, not per batch). Everything Ray-side —
schema contract, batch sizing for large binary payloads, actor-pool
state, output layout — is identical for both flavors and tested; the
real-codec tests are skip-marked on missing libs.

Scale note: binary payloads dominate block size; these stages are meant
to run with a small ``batch_size`` (rows) and ``batch_format='pyarrow'``
so the bytes stay zero-copy in the object store until the decode touches
them, and metadata-only outputs drop the payload column immediately.
"""
from __future__ import annotations

import importlib
import io
import struct

import numpy as np
import pyarrow as pa


def _try_import(name: str):
    """Optional-dependency hook: the module when importable, else None
    (stages fail fast at actor init with the dependency named)."""
    try:
        return importlib.import_module(name)
    except ImportError:
        return None

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

    ``decoder='real'`` uses PIL when importable (one import per ACTOR,
    in ``__init__``) and raises ``NotImplementedError`` naming the
    dependency when it is not; the deterministic ``'fake'`` decoder
    parses the FAKE header so the full Ray plumbing is exercised
    end-to-end in any environment.
    """

    def __init__(self, decoder: str = "fake", drop_payload: bool = True):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._decoder = decoder
        self._drop_payload = drop_payload
        self._pil = None
        if decoder == "real":
            self._pil = _try_import("PIL.Image")
            if self._pil is None:
                raise NotImplementedError(
                    "decoder='real' requires Pillow (PIL) which is not "
                    "installed; use decoder='fake'"
                )

    def _decode_one(self, payload: bytes | None) -> tuple[int | None, int | None, int | None]:
        if payload is None:
            return (None, None, None)
        if self._decoder == "real":
            try:
                img = self._pil.open(io.BytesIO(payload))
                return (int(img.width), int(img.height), len(img.getbands()))
            except Exception:
                return (None, None, None)  # undecodable -> null metadata
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
    """Actor-pool resize stage: fake decoder rewrites the header dims
    (payload passthrough); real decoder PIL-resizes and re-encodes
    (PNG when the source format is unknown). Undecodable payloads pass
    through unchanged on both paths."""

    def __init__(self, width: int, height: int, decoder: str = "fake"):
        self._w = width
        self._h = height
        self._decoder = decoder
        self._pil = None
        if decoder == "real":
            self._pil = _try_import("PIL.Image")
            if self._pil is None:
                raise NotImplementedError(
                    "decoder='real' requires Pillow (PIL) which is not "
                    "installed; use decoder='fake'"
                )

    def _resize_real(self, p: bytes) -> bytes:
        try:
            img = self._pil.open(io.BytesIO(p))
            fmt = img.format or "PNG"
            buf = io.BytesIO()
            img.resize((self._w, self._h)).save(buf, format=fmt)
            return buf.getvalue()
        except Exception:
            return p  # undecodable -> passthrough

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("payload").to_pylist():
            if p is None:
                out.append(p)
            elif self._decoder == "real":
                out.append(self._resize_real(p))
            elif len(p) < _FAKE_HDR.size or p[:4] != _FAKE_MAGIC:
                out.append(p)
            else:
                _, _, _, c = _FAKE_HDR.unpack(p[: _FAKE_HDR.size])
                out.append(
                    _FAKE_HDR.pack(_FAKE_MAGIC, self._w, self._h, c)
                    + p[_FAKE_HDR.size :]
                )
        return batch.set_column(
            batch.column_names.index("payload"), "payload", pa.array(out, pa.binary())
        )


class SampleFrames:
    """Video frame-sampling stage: emits ``frame_index`` rows per media
    row (flat-map shape). The fake decoder emits the schedule
    unconditionally; the real decoder (opencv) clamps the schedule to
    the frames that actually exist in the payload (decoded via a
    temp file — ``cv2.VideoCapture`` has no bytes API)."""

    def __init__(self, every_n: int = 10, max_frames: int = 4, decoder: str = "fake"):
        self._every_n = every_n
        self._max = max_frames
        self._decoder = decoder
        self._cv2 = None
        if decoder == "real":
            self._cv2 = _try_import("cv2")
            if self._cv2 is None:
                raise NotImplementedError(
                    "decoder='real' requires opencv-python (cv2) which is "
                    "not installed; use decoder='fake'"
                )

    def _frame_count(self, payload: bytes | None) -> int | None:
        if payload is None:
            return None
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(payload)
            tmp = f.name
        try:
            cap = self._cv2.VideoCapture(tmp)
            try:
                if not cap.isOpened():
                    return None
                return int(cap.get(self._cv2.CAP_PROP_FRAME_COUNT))
            finally:
                cap.release()
        finally:
            os.unlink(tmp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, urls, frames = [], [], []
        payloads = (
            batch.column("payload").to_pylist()
            if self._decoder == "real" and "payload" in batch.column_names
            else [None] * batch.num_rows
        )
        for mid, url, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("url").to_pylist(),
            payloads,
        ):
            limit = self._max
            if self._decoder == "real":
                n = self._frame_count(payload)
                if n is None:
                    continue  # undecodable video -> no frames emitted
                limit = min(self._max, -(-n // self._every_n))
            for f in range(limit):
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
