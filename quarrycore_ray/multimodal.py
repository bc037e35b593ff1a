"""Multimodal (image/audio/video) column plumbing.

The reference carries multimodal content as `List[Dict]` fields on
`ExtractedContent` (`/root/reference/src/quarrycore/protocols.py:202-242`).
Here media are first-class columns: an opaque `binary` payload plus
typed metadata, processed by actor-pool `map_batches` stages.

Image decode is REAL for the two public container formats implementable
from the spec without third-party codecs:

- PNG (RFC 2083 / W3C spec): chunk walk, zlib inflate (stdlib), and
  full scanline unfiltering (None/Sub/Up/Average/Paeth) for 8-bit
  gray / RGB / RGBA, non-interlaced (`decode_png`; minimal writer
  `encode_png` for fixtures).
- BMP (Windows DIB): BITMAPFILEHEADER + BITMAPINFOHEADER, 8-bit
  gray-palette and 24-bit uncompressed, bottom-up padded rows
  (`decode_bmp`).
- JPEG (ITU-T T.81 baseline + JFIF): marker parse, canonical Huffman,
  dequantize + vectorized IDCT, chroma upsampling, YCbCr->RGB
  (`jpeg.decode_jpeg`; encoder `jpeg.encode_jpeg` for fixtures).
- GIF (GIF87a/89a spec): color tables, extension skipping, LZW with
  variable code widths and CLEAR resets, interlace reordering
  (`gif.decode_gif`; encoder `gif.encode_gif` for fixtures).

Video: YUV4MPEG2 (Y4M, the mjpegtools/ffmpeg raw interchange format —
a public plain-text-header container) parses FOR REAL
(`iter_y4m_frames`; writer `encode_y4m` for fixtures): stream header
`YUV4MPEG2 W.. H.. C..\\n`, per-frame `FRAME..\\n` + planar YUV, with
mono/420/422/444 plane sizing. Frame sampling extracts the luma plane
as the grayscale raster.

PIL/ffmpeg/torchaudio are NOT in this environment, so remaining
formats (mp3/ogg audio, compressed video codecs) stay stubbed:
`decode_stub=True` (default) also accepts the deterministic IMG1 fake
raster; `decode_stub=False` decodes PNG/BMP/JPEG (WAV for audio, Y4M
for video) and raises NotImplementedError for anything else.
Everything around the kernels — schema, batch sizing for large binary
rows, actor signature, output layout — is identical for real and stub
payloads.

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


# --- real PNG / BMP codecs (pure python + stdlib zlib) -----------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type we support (8-bit, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w) or (h, w, c) uint8 array.

    From-spec implementation (W3C PNG / RFC 2083): IHDR/IDAT/IEND chunk
    walk, one zlib stream across IDAT chunks, per-scanline unfilter.
    Supports bit depth 8, color types gray/RGB/RGBA, no interlace —
    the subset a from-scratch engine can guarantee without libpng.
    """
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG depth/color ({depth}/{color_type})"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: prefix sum per channel lane
            recon = line.reshape(-1, ch).cumsum(axis=0) & 0xFF
            recon = recon.reshape(-1)
        else:  # Average (3) / Paeth (4): left-dependency, per-byte loop
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = int(prev[x])
                if ftype == 3:
                    recon[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    recon[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon.astype(np.int32)
    img = out.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 everywhere) for fixtures/tests.
    Accepts (h, w) gray or (h, w, 3|4) uint8 arrays."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        flat = img[:, :, None]
    else:
        ch = img.shape[2]
        color_type = {1: 0, 3: 2, 4: 6}[ch]
        flat = img
    h, w = img.shape[:2]
    scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP (Windows DIB) -> (h, w) gray or (h, w, 3) uint8 array.

    BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit BGR or
    8-bit paletted gray, bottom-up rows padded to 4 bytes — the classic
    public layout.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = []
    for y in range(h):
        off = data_off + y * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=w * bpp // 8, offset=off)
        rows.append(row)
    img = np.stack(rows[::-1] if bottom_up else rows)
    if bpp == 24:
        img = img.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return np.ascontiguousarray(img)
    return img.reshape(h, w)


class DecodeImageStage:
    """Actor-pool decode: payload binary -> (width, height, mean_intensity).

    Magic-sniffed codecs: PNG, BMP and baseline JPEG decode for real
    (`decode_png` / `decode_bmp` / `jpeg.decode_jpeg`, pure python +
    stdlib zlib); the IMG1 deterministic fake raster is accepted while
    `decode_stub=True` (the synth-corpus path). Other formats (GIF,
    TIFF, ...) need libraries this environment lacks and raise
    NotImplementedError. Keep `batch_size` small for large binary rows
    (a batch x concurrency must fit worker heap).
    """

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub

    def _decode(self, payload: bytes) -> tuple[int, int, float]:
        if payload[:8] == _PNG_MAGIC:
            img = decode_png(payload)
            h, w = img.shape[:2]
            return w, h, float(img.mean()) if img.size else 0.0
        if payload[:2] == b"BM":
            img = decode_bmp(payload)
            h, w = img.shape[:2]
            return w, h, float(img.mean()) if img.size else 0.0
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            img = decode_jpeg(payload)
            h, w = img.shape[:2]
            return w, h, float(img.mean()) if img.size else 0.0
        if payload[:4] == b"GIF8":
            from .gif import decode_gif

            img = decode_gif(payload)
            h, w = img.shape[:2]
            return w, h, float(img.mean()) if img.size else 0.0
        if payload[:4] == b"IMG1":
            if not self.decode_stub:
                raise NotImplementedError(
                    "IMG1 is the test stub container; pass decode_stub=True"
                )
            w, h = struct.unpack("<HH", payload[4:8])
            pixels = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
            return w, h, float(pixels.mean()) if len(pixels) else 0.0
        raise NotImplementedError(
            "no codec for this payload format in this environment"
        )

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
    """Resize: nearest-neighbor downsample of the decoded raster
    (PNG/BMP/JPEG via the real codecs, IMG1 via the stub container),
    output re-encoded as PNG (gray; color inputs are luma-averaged
    first). Output replaces the payload column."""

    def __init__(self, target: int = 32, decode_stub: bool = True):
        self.target = target
        self.decode_stub = decode_stub

    def _raster(self, p: bytes) -> np.ndarray:
        if p[:8] == _PNG_MAGIC:
            img = decode_png(p)
        elif p[:2] == b"BM":
            img = decode_bmp(p)
        elif p[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            img = decode_jpeg(p)
        elif p[:4] == b"GIF8":
            from .gif import decode_gif

            img = decode_gif(p)
        elif p[:4] == b"IMG1":
            if not self.decode_stub:
                raise NotImplementedError(
                    "IMG1 is the test stub container; pass decode_stub=True"
                )
            w, h = struct.unpack("<HH", p[4:8])
            raw = np.frombuffer(p[8 : 8 + w * h], dtype=np.uint8)
            if len(raw) < w * h:
                raw = np.pad(raw, (0, w * h - len(raw)))
            return raw.reshape(h, w)
        else:
            raise NotImplementedError("no codec for this payload format")
        if img.ndim == 3:  # luma-average color planes to gray
            img = img.mean(axis=2).astype(np.uint8)
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for p in batch["payload"].to_pylist():
            img = self._raster(p)
            h, w = img.shape
            yi = np.linspace(0, h - 1, self.target).astype(int)
            xi = np.linspace(0, w - 1, self.target).astype(int)
            out.append(encode_png(img[np.ix_(yi, xi)]))
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, pa.binary()))


def media_features(
    media: "ray.data.Dataset", batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Decode -> per-media features. Small batch_size: binary rows are
    orders of magnitude wider than text rows. Default pool: fixed,
    pre-started (config.fixed_probe_pool — autoscaling ramps measured
    2.2x slower on bursty stages)."""
    if concurrency is None:
        from .config import fixed_probe_pool

        concurrency = fixed_probe_pool()
    return media.map_batches(
        DecodeImageStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


_Y4M_MAGIC = b"YUV4MPEG2"

#: chroma plane size as a fraction of the luma plane, per Y4M C tag.
#: All C420 siting variants (jpeg/mpeg2/paldv) share the plane layout;
#: siting only matters for chroma upsampling, which luma-only sampling
#: never performs.
_Y4M_CHROMA_FRACTION = {
    "mono": 0.0,
    "420": 0.25,
    "420jpeg": 0.25,
    "420mpeg2": 0.25,
    "420paldv": 0.25,
    "422": 0.5,
    "444": 1.0,
}


def iter_y4m_frames(payload: bytes):
    """Parse a YUV4MPEG2 stream, yielding (width, height, luma_bytes).

    From-spec (mjpegtools yuv4mpeg(5)): a plain-text stream header
    ``YUV4MPEG2 <tagged params>\\n`` (W<w> H<h> C<colorspace>, plus
    F/I/A/X tags we skip), then per frame a ``FRAME<params>\\n`` line
    followed by raw planar data — Y then Cb then Cr, plane sizes fixed
    by the colorspace. Only the luma plane is materialized; chroma is
    skipped by offset arithmetic (zero-copy until the caller slices).
    """
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "strict")
    parts = header.split(" ")
    if parts[0] != _Y4M_MAGIC.decode():
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    colorspace = "420jpeg"  # spec default when C is absent
    for tag in parts[1:]:
        if not tag:
            continue
        if tag[0] == "W":
            width = int(tag[1:])
        elif tag[0] == "H":
            height = int(tag[1:])
        elif tag[0] == "C":
            colorspace = tag[1:]
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace not in _Y4M_CHROMA_FRACTION:
        raise NotImplementedError(f"unsupported Y4M colorspace C{colorspace}")
    luma_bytes = width * height
    frame_bytes = luma_bytes + 2 * int(
        luma_bytes * _Y4M_CHROMA_FRACTION[colorspace]
    )
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        data_start = fnl + 1
        if data_start + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        yield width, height, payload[data_start : data_start + luma_bytes]
        pos = data_start + frame_bytes


def encode_y4m(frames: np.ndarray, chroma: int = 128) -> bytes:
    """(n, h, w) uint8 luma frames -> Y4M bytes (fixture helper).

    Emits C420jpeg with constant-``chroma`` planes when both dims are
    even (the 4:2:0 validity condition), else Cmono — both layouts the
    real parser must handle.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    mono = (w % 2) or (h % 2)
    cspace = "mono" if mono else "420jpeg"
    head = f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C{cspace}\n".encode()
    cplane = b"" if mono else bytes([chroma]) * ((w // 2) * (h // 2))
    return head + b"".join(
        b"FRAME\n" + frames[i].tobytes() + cplane + cplane for i in range(n)
    )


class FrameSampleStage:
    """Video frame sampling: one output row per k-th frame (row explosion).

    YUV4MPEG2 payloads decode FOR REAL (`iter_y4m_frames`): every k-th
    frame's luma plane is emitted as a grayscale image payload
    chainable into DecodeImageStage — the ffmpeg/pyav
    keyframe-extraction stage shape with a from-spec container parser.
    The VID1 fake container (b"VID1" + uint16 n_frames/w/h + rasters)
    remains the declared stub for compressed codecs this environment
    lacks, accepted only while `decode_stub=True`.
    """

    def __init__(self, every: int = 2, decode_stub: bool = True):
        self.every = every
        self.decode_stub = decode_stub

    def _frames(self, p: bytes):
        """Yield (frame_idx, width, height, raster_bytes) for every
        k-th frame of one payload."""
        if p[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
            for fi, (w, h, luma) in enumerate(iter_y4m_frames(p)):
                if fi % self.every == 0:
                    yield fi, w, h, luma
            return
        if p[:4] == b"VID1":
            if not self.decode_stub:
                raise NotImplementedError(
                    "VID1 is the test stub container; pass decode_stub=True"
                )
            n_frames, w, h = struct.unpack("<HHH", p[4:10])
            frame_bytes = w * h
            for fi in range(0, n_frames, self.every):
                start = 10 + fi * frame_bytes
                yield fi, w, h, p[start : start + frame_bytes]
            return
        raise NotImplementedError(
            "no codec for this video format in this environment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_media: list[int] = []
        out_frame: list[int] = []
        out_payload: list[bytes] = []
        for mid, p in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for fi, w, h, raster in self._frames(p):
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


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """int16 PCM samples -> WAV bytes (stdlib `wave`; fixture helper)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


class DecodeAudioStage:
    """Actor-pool audio decode: WAV payloads decode FOR REAL via the
    stdlib `wave` module (RIFF/WAVE is a public container; PCM 8/16-bit);
    other audio formats (mp3/ogg/flac) need codec libraries this
    environment lacks and raise NotImplementedError. Output columns:
    sample_rate, n_channels, n_samples, duration_s, rms — the audio
    analog of DecodeImageStage's feature row.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        rates: list[int] = []
        chans: list[int] = []
        counts: list[int] = []
        durs: list[float] = []
        rms: list[float] = []
        for p in batch["payload"].to_pylist():
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                raise NotImplementedError(
                    "no codec for this audio format in this environment"
                )
            with wave.open(io.BytesIO(p), "rb") as w:
                sr = w.getframerate()
                nc = w.getnchannels()
                nf = w.getnframes()
                width = w.getsampwidth()
                raw = w.readframes(nf)
            if width == 2:
                x = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
            elif width == 1:  # 8-bit WAV is unsigned, midpoint 128
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            else:
                raise NotImplementedError(f"unsupported WAV sample width {width}")
            rates.append(sr)
            chans.append(nc)
            counts.append(nf)
            durs.append(nf / sr if sr else 0.0)
            rms.append(float(np.sqrt((x * x).mean())) if x.size else 0.0)
        batch = batch.append_column("sample_rate", pa.array(rates, pa.int32()))
        batch = batch.append_column("n_channels", pa.array(chans, pa.int32()))
        batch = batch.append_column("n_samples", pa.array(counts, pa.int64()))
        batch = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        return batch.append_column("rms", pa.array(rms, pa.float64()))


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


def dhash16(img: np.ndarray) -> int:
    """16-bit difference hash (dHash, the public perceptual-hash recipe
    scaled to the tiny fixture rasters): partition the image into a
    4-row x 5-column grid by the area map cell(x) = x*5 // w (nonempty
    for w >= 5, h >= 4), then bit (r, c) = 1 iff grid-mean(r, c) <
    grid-mean(r, c+1). Means compare by exact integer cross
    multiplication (sum_a * cnt_b < sum_b * cnt_a) — no division, so
    the bit pattern is reproducible in SQL integer arithmetic.
    Constant-offset intensity shifts leave the hash unchanged (the
    property that makes dHash a NEAR-duplicate key, not an exact one).
    RGB(A) inputs hash their per-pixel channel sum (ordering-equivalent
    to the mean)."""
    if img.ndim == 3:
        img = img[:, :, :3].astype(np.int64).sum(axis=2)
    h, w = img.shape
    if h < 4 or w < 5:
        return 0
    idx = np.arange(h * w, dtype=np.int64)
    cell = (idx // w) * 4 // h * 5 + (idx % w) * 5 // w
    flat = img.astype(np.int64).ravel()
    sums = np.bincount(cell, weights=flat, minlength=20).astype(np.int64)
    cnts = np.bincount(cell, minlength=20).astype(np.int64)
    bits = 0
    for r in range(4):
        for c in range(4):
            a, b = r * 5 + c, r * 5 + c + 1
            if sums[a] * cnts[b] < sums[b] * cnts[a]:
                bits |= 1 << (r * 4 + c)
    return bits


class DHashStage:
    """Actor-pool stage: payload binary -> (doc_id, dhash) through the
    REAL codecs (same magic sniffing as DecodeImageStage)."""

    def __init__(self) -> None:
        self._decoder = DecodeImageStage(decode_stub=False)

    def _img(self, payload: bytes) -> np.ndarray:
        if payload[:8] == _PNG_MAGIC:
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            return decode_jpeg(payload)
        if payload[:4] == b"GIF8":
            from .gif import decode_gif

            return decode_gif(payload)
        raise NotImplementedError("unsupported image container for dHash")

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            dhash16(self._img(p)) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dhash": pa.array(hashes, pa.int64()),
            }
        )


def audio_fp15(samples: np.ndarray, n_frames: int = 16) -> int:
    """15-bit energy-envelope fingerprint (the Haitsma-Kalker 2002 sign
    -of-energy-delta recipe, time-domain variant): partition samples
    into `n_frames` frames by the area map frame(i) = i*n_frames // n,
    compute each frame's energy as an exact int64 sum of squares, and
    set bit k iff energy(k+1) > energy(k). All-integer, so the SQL twin
    reproduces it bit-for-bit; constant time-shift of a few samples
    flips few bits (the near-duplicate property)."""
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    if n < n_frames:
        return 0
    frame = np.arange(n, dtype=np.int64) * n_frames // n
    energy = np.bincount(frame, weights=(x * x).astype(np.float64),
                         minlength=n_frames).astype(np.int64)
    bits = 0
    for k in range(n_frames - 1):
        if energy[k + 1] > energy[k]:
            bits |= 1 << k
    return bits


class AudioFingerprintStage:
    """Actor-pool stage: WAV payload -> (doc_id, afp) via the real
    stdlib-wave decode + `audio_fp15`."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        fps: list[int] = []
        for p in batch["payload"].to_pylist():
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                raise NotImplementedError(
                    "no codec for this audio format in this environment"
                )
            with wave.open(io.BytesIO(p), "rb") as w:
                nf = w.getnframes()
                width = w.getsampwidth()
                raw = w.readframes(nf)
            if width == 2:
                x = np.frombuffer(raw, dtype=np.int16)
            elif width == 1:
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
            else:
                raise NotImplementedError(f"unsupported WAV sample width {width}")
            fps.append(audio_fp15(x))
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "afp": pa.array(fps, pa.int64()),
            }
        )
