"""Multimodal (image/audio/video) column plumbing.

The reference carries multimodal content as `List[Dict]` fields on
`ExtractedContent` (`/root/reference/src/quarrycore/protocols.py:202-242`).
Here media are first-class columns: an opaque `binary` payload plus
typed metadata, processed by actor-pool `map_batches` stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment,
so the decode kernel is stubbed: `decode_stub=True` (default) parses a
deterministic fake header; `decode_stub=False` raises
NotImplementedError at the decode call site. Everything around the stub
— schema, batch sizing for large binary rows, actor signature, output
layout — is real and tested, so swapping in a real codec is a one-
function change.

Fake payload format (for tests/synth): b"IMG1" + uint16 width +
uint16 height + raw bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("source_doc", pa.int64()),
    ]
)


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    return b"IMG1" + struct.pack("<HH", width, height) + raw


class DecodeImageStage:
    """Actor-pool decode: payload binary -> (width, height, mean_intensity).

    With a real codec this would be `PIL.Image.open(BytesIO(payload))`;
    the stub parses the IMG1 fake header. Keep `batch_size` small for
    large binary rows (a batch x concurrency must fit worker heap).
    """

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub

    def _decode(self, payload: bytes) -> tuple[int, int, float]:
        if not self.decode_stub:
            raise NotImplementedError(
                "real image codec not available in this environment"
            )
        if payload[:4] != b"IMG1":
            raise ValueError("bad magic")
        w, h = struct.unpack("<HH", payload[4:8])
        pixels = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
        return w, h, float(pixels.mean()) if len(pixels) else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws: list[int] = []
        hs: list[int] = []
        means: list[float] = []
        for p in batch["payload"].to_pylist():
            w, h, m = self._decode(p)
            ws.append(w)
            hs.append(h)
            means.append(m)
        batch = batch.append_column("width", pa.array(ws, pa.int32()))
        batch = batch.append_column("height", pa.array(hs, pa.int32()))
        return batch.append_column("mean_intensity", pa.array(means, pa.float64()))


class ResizeStage:
    """Resize plumbing: recompute payload at target size (stub: nearest-
    neighbor subsample of the fake raster). Output replaces payload and
    dimension columns."""

    def __init__(self, target: int = 32, decode_stub: bool = True):
        self.target = target
        self.decode_stub = decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.decode_stub:
            raise NotImplementedError("real resize kernel not available")
        out: list[bytes] = []
        for p in batch["payload"].to_pylist():
            w, h = struct.unpack("<HH", p[4:8])
            raw = np.frombuffer(p[8 : 8 + w * h], dtype=np.uint8)
            if len(raw) < w * h:
                raw = np.pad(raw, (0, w * h - len(raw)))
            img = raw.reshape(h, w)
            yi = np.linspace(0, h - 1, self.target).astype(int)
            xi = np.linspace(0, w - 1, self.target).astype(int)
            small = img[np.ix_(yi, xi)]
            out.append(
                b"IMG1" + struct.pack("<HH", self.target, self.target) + small.tobytes()
            )
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, pa.binary()))


def media_features(
    media: "ray.data.Dataset", batch_size: int = 64, concurrency=(1, 4)
) -> "ray.data.Dataset":
    """Decode -> per-media features. Small batch_size: binary rows are
    orders of magnitude wider than text rows."""
    return media.map_batches(
        DecodeImageStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Video frame sampling: one output row per k-th frame (row explosion).

    Fake video payload: b"VID1" + uint16 n_frames + uint16 w + uint16 h
    + n_frames rasters of w*h bytes. With a real codec this is the
    ffmpeg/pyav keyframe-extraction stage; the plumbing — explode rows,
    emit per-frame payloads as IMG1 images chainable into
    DecodeImageStage — is real.
    """

    def __init__(self, every: int = 2, decode_stub: bool = True):
        self.every = every
        self.decode_stub = decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.decode_stub:
            raise NotImplementedError("real video codec not available")
        out_media: list[int] = []
        out_frame: list[int] = []
        out_payload: list[bytes] = []
        for mid, p in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if p[:4] != b"VID1":
                raise ValueError("bad magic")
            n_frames, w, h = struct.unpack("<HHH", p[4:10])
            frame_bytes = w * h
            for fi in range(0, n_frames, self.every):
                start = 10 + fi * frame_bytes
                raster = p[start : start + frame_bytes]
                out_media.append(mid)
                out_frame.append(fi)
                out_payload.append(b"IMG1" + struct.pack("<HH", w, h) + raster)
        return pa.table(
            {
                "media_id": pa.array(out_media, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
                "payload": pa.array(out_payload, pa.binary()),
            }
        )


def make_fake_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, n_frames * width * height, dtype=np.uint8).tobytes()
    return b"VID1" + struct.pack("<HHH", n_frames, width, height) + raw


def synth_media_table(n: int = 50, seed: int = 3) -> pa.Table:
    rows = {
        "media_id": list(range(n)),
        "kind": ["image"] * n,
        "payload": [
            make_fake_image(16 + (i % 5) * 8, 16 + (i % 3) * 8, seed + i) for i in range(n)
        ],
        "mime": ["image/fake"] * n,
        "source_doc": [i % 10 for i in range(n)],
    }
    return pa.table(
        {name: pa.array(rows[name], MEDIA_SCHEMA.field(name).type) for name in MEDIA_SCHEMA.names}
    )
