"""GIF87a/GIF89a codec, pure python + numpy, from the public spec.

Implements the CompuServe GIF specification (GIF89a, 1990) and its LZW
variable-code-width compression — no third-party codec:

- decoder (`decode_gif`): header + logical screen descriptor, global /
  local color tables, extension-block skipping (graphic control,
  comment, application), image descriptor, LZW decompression with
  dictionary growth to 12-bit codes and CLEAR/EOI handling, 4-pass
  interlace reordering. Decodes the FIRST image frame (the reference
  treats media as opaque single images; animation frames beyond the
  first are out of scope) into an (h, w, 3) RGB uint8 array.
- encoder (`encode_gif`): grayscale input, 256-entry gray global color
  table, spec LZW compression (emit CLEAR when the dictionary fills) —
  the fixture-building counterpart.

The reference treats images as opaque media handled by PIL
(/root/reference/src/quarrycore/protocols.py:202-242); this module
joins `decode_png` / `decode_bmp` / `jpeg.decode_jpeg` so the
multimodal decode stage runs REAL codecs for all four major public
image containers.

Supported subset (honest boundaries): single frame, global or local
color table required, no transparency compositing (the GCE is parsed
and skipped — a lone frame has nothing to composite against).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR resets the dictionary, widths grow when the next code would
    not fit, capped at 12 bits (spec appendix)."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader: GIF packs codes least-significant-bit first
    bitbuf = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # missing EOI: tolerate truncated streams
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width

        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out

        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + entry[:1])
        # widen when the ENCODER's next assignable code no longer fits:
        # the encoder assigns W+k at the moment it emits W, so its
        # dictionary runs one entry ahead of ours (len + 1)
        if len(dictionary) + 1 >= (1 << width) and width < 12:
            width += 1
        prev = entry


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Spec LZW encoder (fixture counterpart of `_lzw_decode`)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for b in indices.tobytes():
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # mirror the decoder: widen once the next code to assign
            # no longer fits the current width
            if next_code >= (1 << width) and width < 12:
                width += 1
        else:  # dictionary full: reset (keeps decoder state in sync)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


#: interlace pass layout (spec appendix E): (start row, step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF -> (h, w, 3) RGB uint8 array (first frame)."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        palette = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image with no color table")
        min_code_size = payload[pos]
        pos += 1
        compressed = bytearray()
        while payload[pos]:
            size = payload[pos]
            compressed += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.array(_lzw_decode(bytes(compressed), min_code_size), np.int32)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # de-interlace (4 passes)
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            order = np.empty(h, np.int64)
            order[np.array(rows, np.int64)] = np.arange(h)
            idx = idx[order]
        return palette[idx]
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w) gray uint8 -> single-frame GIF89a with a 256-entry gray
    global color table (fixture helper; index == intensity)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gif takes a grayscale (h, w) array")
    h, w = img.shape
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    gct = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(img.reshape(-1), 8)
    subs = bytearray([8])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        subs.append(len(chunk))
        subs += chunk
    subs.append(0)
    return head + gct + desc + bytes(subs) + b"\x3b"
