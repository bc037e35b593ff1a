"""Baseline JPEG codec, pure python + numpy, from the public spec.

Implements the baseline sequential DCT process of ITU-T T.81 (ISO/IEC
10918-1) with the JFIF container conventions — no third-party codec:

- decoder (`decode_jpeg`): marker parse (SOI/APPn/COM/DQT/DHT/DRI/
  SOF0/SOF1/SOS/EOI), canonical Huffman DECODE/RECEIVE/EXTEND
  (T.81 F.2.2), run-length AC with ZRL/EOB, restart markers,
  dequantize, vectorized 8x8 IDCT (orthonormal DCT-II basis matrix,
  one einsum over all blocks of a component), chroma upsampling for
  subsampled scans (factors up to 2x2), JFIF YCbCr -> RGB.
- encoder (`encode_jpeg`): grayscale or 4:4:4 color, Annex K example
  quantization + Huffman tables, vectorized FDCT, round-half-up
  quantization (floor(x/Q + 0.5) — T.81 leaves the tie rule to the
  implementation; ours is mirrored by the SQL oracle in
  `jpeg_decode_stats`).

The reference treats images as opaque media handled by PIL
(/root/reference/src/quarrycore/protocols.py:202-242); this module is
the from-scratch equivalent so the multimodal decode stage
(multimodal.DecodeImageStage) runs a REAL codec for the third major
public image container alongside PNG and BMP.

Supported subset (honest boundaries, NotImplementedError beyond):
8-bit baseline Huffman, 1 or 3 components, sampling factors <= 2,
non-progressive, non-arithmetic, no 12-bit, no hierarchical.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (T.81 Annex K examples; public tables) -------------------------

#: zigzag scan order: ZIGZAG[k] = (row, col) flattened index of the k-th
#: coefficient in scan order (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 luminance quantization table, in natural (row-major) order
STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table
STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: C[u, x] = c(u)/2 cos((2x+1)u pi/16).
    FDCT of block f: C @ f @ C.T; IDCT of F: C.T @ F @ C."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


# --- canonical Huffman machinery (T.81 Annex C / F.2.2) ------------------------


class _HuffTable:
    """Canonical Huffman table: MINCODE/MAXCODE/VALPTR per code length
    (T.81 F.2.2.3 DECODE) built from (BITS, HUFFVAL)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals", "enc")

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = list(vals)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1] == 0:
                self.maxcode[ln] = -1
            else:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        # encoder view: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.enc[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        """RECEIVE(n): next n bits as an unsigned int (T.81 F.2.2.4)."""
        if n == 0:
            return 0
        v = 0
        bits = self.bits
        p = self.pos
        for i in range(n):
            v = (v << 1) | int(bits[p + i])
        self.pos = p + n
        return v

    def decode(self, table: _HuffTable) -> int:
        """DECODE: walk code lengths until code <= MAXCODE(l) (F.2.2.3)."""
        code = self.read_bit()
        ln = 1
        while code > table.maxcode[ln]:
            code = (code << 1) | self.read_bit()
            ln += 1
            if ln > 16:
                raise ValueError("corrupt JPEG: huffman code overrun")
        return table.vals[table.valptr[ln] + code - table.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """EXTEND(V, T): map T-bit magnitude to signed value (T.81 F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding (F.1.2.3)
        return bytes(self.out)


# --- decoder -------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w) gray or (h, w, 3) RGB uint8 array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None  # (h, w, [(cid, hsamp, vsamp, tq)])
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, np.uint8, 64, off + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
            data_start = pos + seglen
            return _decode_scan(
                payload, data_start, frame, scan_tables, qtables,
                htables, restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded segment starting at `start`; return the
    list of restart-separated chunks and the position after the data."""
    chunks: list[bytes] = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker ends the scan
            break
    chunks.append(bytes(cur))
    return chunks, pos


def _decode_scan(payload, data_start, frame, scan_tables, qtables,
                 htables, restart_interval):
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError("only 1- or 3-component scans supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    chunks, _ = _split_entropy(payload, data_start)
    # coefficient planes per component, MCU-padded
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    coefs = [[] for _ in comps]  # (by, bx, zigzag-coef array)

    n_mcu = mcux * mcuy
    per_chunk = restart_interval if restart_interval else n_mcu
    pred = [0] * len(comps)
    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcu:
            break
        reader = _BitReader(chunk)
        pred = [0] * len(comps)  # restart resets DC predictors
        for _ in range(min(per_chunk, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dct = htables[(0, td)]
                act = htables[(1, ta)]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode(dct)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        # dequantize + IDCT happen vectorized below
                        coefs[ci].append((my * vs + by, mx * hs + bx, zz))
            mcu += 1

    # vectorized dequantize + IDCT per component
    out_planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        q = qtables[tq].astype(np.float64)
        items = coefs[ci]
        if not items:
            out_planes.append(planes[ci])
            continue
        zz_all = np.stack([it[2] for it in items]).astype(np.float64)
        blocks = np.zeros((len(items), 64), dtype=np.float64)
        blocks[:, ZIGZAG] = zz_all  # zigzag -> natural order
        blocks = blocks.reshape(-1, 8, 8) * q[None, :, :]
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + 128.0
        plane = planes[ci]
        for (by, bx, _), blk in zip(items, spatial):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
        # upsample to full MCU-padded resolution
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out_planes.append(plane[: h, : w])

    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder -------------------------------------------------------------------


def _encode_block(zz: np.ndarray, pred: int, dct: _HuffTable,
                  act: _HuffTable, bw: _BitWriter) -> int:
    """Huffman-encode one zigzag-ordered quantized block; returns new DC
    predictor."""
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, ln = dct.enc[t]
    bw.write(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act.enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = act.enc[(run << 4) | s]
        bw.write(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.write(vv, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = act.enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JFIF JPEG bytes
    (4:4:4, Annex K tables, no restart markers)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    qts = [STD_LUMA_Q] + ([STD_CHROMA_Q] if not gray else [])
    dc_t = [_HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS),
            _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_t = [_HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS),
            _HuffTable(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # quantized zigzag blocks per component (vectorized FDCT)
    comp_blocks: list[np.ndarray] = []
    for ci, plane in enumerate(planes):
        pad = np.empty((ph, pw), dtype=np.float64)
        pad[:h, :w] = plane
        pad[h:, :w] = plane[h - 1 : h, :]  # edge-replicate padding
        pad[:, w:] = pad[:, w - 1 : w]
        blocks = (
            pad.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        fdct = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        q = qts[min(ci, 1)].astype(np.float64).reshape(8, 8)
        zz = np.floor(fdct / q[None, :, :] + 0.5).astype(np.int64)
        comp_blocks.append(zz.reshape(-1, 64)[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, q in enumerate(qts):
        zzq = np.zeros(64, dtype=np.int64)
        zzq[:] = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in zzq
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    hts = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
           (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        hts += [(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tc, th, bits, vals in hts:
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = min(ci, 1)
        sos += bytes([ci + 1, tid << 4 | tid])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    nby, nbx = ph // 8, pw // 8
    preds = [0] * ncomp
    for bi in range(nby * nbx):  # 4:4:4 -> MCU is one block per component
        for ci in range(ncomp):
            tid = min(ci, 1)
            preds[ci] = _encode_block(
                comp_blocks[ci][bi], preds[ci], dc_t[tid], ac_t[tid], bw
            )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
