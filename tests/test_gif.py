"""GIF codec tests (quarrycore_ray/gif.py): LZW width transitions,
interlace reordering, local color tables, extension skipping, and the
decode-stage integration. The reference handles images opaquely via
PIL (protocols.py:202-242); these pin our from-spec replacement."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quarrycore_ray.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif


def _gray_gct() -> bytes:
    return np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()


def _wrap_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


class TestLzw:
    def test_width_transitions_and_dict_reset(self):
        # long low-entropy stream crosses 512/1024/2048/4096 boundaries
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 4, 60_000, dtype=np.uint8)
        dec = _lzw_decode(_lzw_encode(idx, 8), 8)
        assert np.array_equal(np.array(dec, np.uint8), idx)

    def test_small_min_code_size(self):
        # 2-bit symbols with min code size 2 (clear=4, end=5)
        idx = np.array([0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3] * 40, np.uint8)
        dec = _lzw_decode(_lzw_encode(idx, 2), 2)
        assert np.array_equal(np.array(dec, np.uint8), idx)

    def test_kwkwk_special_case(self):
        # "aaaa..." forces code == next dictionary slot immediately
        idx = np.zeros(50, np.uint8)
        dec = _lzw_decode(_lzw_encode(idx, 8), 8)
        assert np.array_equal(np.array(dec, np.uint8), idx)

    def test_corrupt_stream_rejected(self):
        # a code far beyond the dictionary is corrupt
        with pytest.raises(ValueError):
            _lzw_decode(b"\xff\xff\xff\xff", 2)


class TestDecodeGif:
    def test_roundtrip_matches_input(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (40, 30), dtype=np.uint8)
        out = decode_gif(encode_gif(img))
        assert out.shape == (40, 30, 3)
        for c in range(3):  # gray palette: all channels equal the index
            assert np.array_equal(out[:, :, c], img)

    def test_interlaced_rows_reordered(self):
        # hand-build an interlaced GIF: rows stored in 4-pass order
        img = np.arange(8, dtype=np.uint8)[:, None] * np.ones((8, 4), np.uint8)
        pass_order = [0, 4, 2, 6, 1, 3, 5, 7]  # 8-row case of the spec passes
        stored = img[pass_order]
        head = b"GIF89a" + struct.pack("<HHBBB", 4, 8, 0x87, 0, 0) + _gray_gct()
        desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 8, 0x40)  # interlace bit
        lzw = _lzw_encode(stored.reshape(-1), 8)
        payload = head + desc + bytes([8]) + _wrap_subblocks(lzw) + b"\x3b"
        out = decode_gif(payload)
        assert np.array_equal(out[:, :, 0], img)

    def test_local_color_table_overrides_global(self):
        # inverted local palette: index i -> 255 - i
        lct = np.repeat(np.arange(255, -1, -1, dtype=np.uint8), 3).tobytes()
        img = np.array([[0, 10], [200, 255]], np.uint8)
        head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x87, 0, 0) + _gray_gct()
        desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80 | 0x07) + lct
        lzw = _lzw_encode(img.reshape(-1), 8)
        payload = head + desc + bytes([8]) + _wrap_subblocks(lzw) + b"\x3b"
        out = decode_gif(payload)
        assert np.array_equal(out[:, :, 0], 255 - img)

    def test_extensions_skipped(self):
        # graphic-control + comment extensions before the image block
        img = np.full((3, 3), 42, np.uint8)
        base = encode_gif(img)
        head, rest = base[: 13 + 768], base[13 + 768 :]
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        comment = b"\x21\xfe\x05hello\x00"
        assert np.array_equal(decode_gif(head + gce + comment + rest)[:, :, 0], img)

    def test_error_paths(self):
        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF")
        # no color table at all
        head = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x00, 0, 0)
        desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        with pytest.raises(ValueError):
            decode_gif(head + desc + bytes([8, 1, 0, 0]) + b"\x3b")
        # trailer with no image frame
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")
        with pytest.raises(ValueError):
            decode_gif(encode_gif(np.zeros((4, 4), np.uint8))[:-30])

    @given(
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_property(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_gif(encode_gif(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out[:, :, 0], img)


class TestStageIntegration:
    def test_decode_stage_sniffs_gif(self):
        from quarrycore_ray.multimodal import DecodeImageStage

        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([encode_gif(img)], pa.binary()),
            }
        )
        out = DecodeImageStage(decode_stub=False)(batch)
        assert out["width"].to_pylist() == [8]
        assert out["height"].to_pylist() == [6]
        assert out["mean_intensity"].to_pylist() == [float(img.mean())]

    def test_resize_stage_reads_gif(self):
        from quarrycore_ray.multimodal import ResizeStage, decode_png

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        batch = pa.table({"payload": pa.array([encode_gif(img)], pa.binary())})
        resized = ResizeStage(target=4, decode_stub=False)(batch)
        small = decode_png(resized["payload"][0].as_py())
        # gray palette -> RGB; ResizeStage luma-averages back to gray,
        # so nearest-neighbor picks survive exactly
        idx = np.linspace(0, 15, 4).astype(int)
        assert np.array_equal(small, img[np.ix_(idx, idx)])
