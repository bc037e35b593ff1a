"""Baseline JPEG codec (quarrycore_ray/jpeg.py) verification.

Three independence layers, so encoder and decoder cannot agree by
sharing a bug:

1. `TestNaivePrediction` predicts the decoder's exact output with a
   test-local nested-loop FDCT/quantize/dequantize/IDCT (no module
   math helpers) — if the module's Huffman or einsum path corrupted a
   single coefficient the prediction would miss.
2. `TestHandcrafted` hand-assembles bitstreams with a test-local
   canonical-code generator and bit writer: a 4:2:0 subsampled color
   frame and a restart-marker grayscale frame — shapes the module's
   own encoder (4:4:4, no restarts) cannot emit.
3. `TestOracleContract` pins the even-constant losslessness that the
   jpeg_decode_stats driver oracle relies on, for every even value.
"""

import struct

import numpy as np
import pytest

from quarrycore_ray.jpeg import (
    STD_CHROMA_Q,
    STD_LUMA_Q,
    ZIGZAG,
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)


# --- test-local reference math (independent of module helpers) ----------------


def naive_dct_2d(block: np.ndarray, inverse: bool) -> np.ndarray:
    """Nested-loop orthonormal 8x8 DCT-II / its inverse."""
    out = np.zeros((8, 8))
    for a in range(8):
        for b in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    if inverse:
                        cu = (1 / np.sqrt(2)) if x == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if y == 0 else 1.0
                        s += (
                            cu * cv / 4.0 * block[x, y]
                            * np.cos((2 * a + 1) * x * np.pi / 16)
                            * np.cos((2 * b + 1) * y * np.pi / 16)
                        )
                    else:
                        s += (
                            block[x, y]
                            * np.cos((2 * x + 1) * a * np.pi / 16)
                            * np.cos((2 * y + 1) * b * np.pi / 16)
                        )
            if not inverse:
                ca = (1 / np.sqrt(2)) if a == 0 else 1.0
                cb = (1 / np.sqrt(2)) if b == 0 else 1.0
                s *= ca * cb / 4.0
            out[a, b] = s
    return out


def predict_gray_decode(img: np.ndarray) -> np.ndarray:
    """What decode(encode(img)) must return for a gray multiple-of-8
    image, via naive loops and the module's round-half-up quant rule."""
    h, w = img.shape
    q = np.asarray(STD_LUMA_Q, dtype=np.float64).reshape(8, 8)
    out = np.zeros((h, w))
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float) - 128.0
            coef = naive_dct_2d(blk, inverse=False)
            quant = np.floor(coef / q + 0.5)
            rec = naive_dct_2d(quant * q, inverse=True) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rec
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def make_enc(bits, vals):
    """Test-local canonical Huffman encoder table (symbol -> (code, len))."""
    enc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


class Bits:
    """Test-local MSB-first bit accumulator with FF byte stuffing."""

    def __init__(self):
        self.s = ""

    def put(self, code, ln):
        self.s += format(code, f"0{ln}b")

    def bytes(self):
        s = self.s + "1" * (-len(self.s) % 8)
        out = bytearray()
        for i in range(0, len(s), 8):
            b = int(s[i : i + 8], 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def dc_only_block(bits_acc, enc_dc, enc_ac, sq, pred):
    """Append one DC-only block (value sq, predictor pred) + EOB."""
    diff = sq - pred
    t = abs(diff).bit_length()
    code, ln = enc_dc[t]
    bits_acc.put(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        bits_acc.put(v, t)
    code, ln = enc_ac[0x00]
    bits_acc.put(code, ln)
    return sq


def seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def dqt_seg(tq, table):
    zz = np.asarray(table, dtype=np.int64).reshape(-1)[ZIGZAG]
    return seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))


def dht_seg(tc, th, bits, vals):
    return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


# --- tests ---------------------------------------------------------------------


class TestNaivePrediction:
    def test_random_gray_matches_naive_pipeline_exactly(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        got = decode_jpeg(encode_jpeg(img))
        want = predict_gray_decode(img)
        # module and naive math may round a coefficient differently only
        # if a dequantized pixel lands within float noise of x.5; allow
        # zero tolerance — the quant rule is identical on both paths
        np.testing.assert_array_equal(got, want)

    def test_smooth_gradient_matches_naive(self):
        img = (
            np.linspace(0, 255, 8 * 32, dtype=np.float64)
            .reshape(8, 32)
            .astype(np.uint8)
        )
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img)), predict_gray_decode(img)
        )


class TestRoundTrip:
    def test_gray_nonmultiple_dims_crop(self):
        rng = np.random.default_rng(3)
        img = rng.integers(90, 110, (13, 21), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (13, 21)
        # low-contrast noise: error bounded by the high-frequency
        # Annex-K quantization steps (measured 17 for this seed)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 24

    def test_color_constant_near_exact(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = (200, 60, 120)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_progressive_rejected(self):
        payload = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        idx = payload.find(b"\xff\xc0")
        payload[idx + 1] = 0xC2  # claim progressive
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG")


class TestHandcrafted:
    def test_420_subsampled_constant_color(self):
        """Hand-assembled 4:2:0 frame: Y=2x2 sampling, one MCU, 16x16.
        DC-only constants; expected RGB from the JFIF equations."""
        sq_y, sq_cb, sq_cr = 3, -2, 4
        y = sq_y * STD_LUMA_Q[0] / 8.0 + 128.0
        cb = sq_cb * STD_CHROMA_Q[0] / 8.0 + 128.0
        cr = sq_cr * STD_CHROMA_Q[0] / 8.0 + 128.0
        exp_r = int(np.clip(np.round(y + 1.402 * (cr - 128)), 0, 255))
        exp_g = int(
            np.clip(
                np.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255
            )
        )
        exp_b = int(np.clip(np.round(y + 1.772 * (cb - 128)), 0, 255))

        enc_dc_l = make_enc(_DC_LUMA_BITS, _DC_LUMA_VALS)
        enc_ac_l = make_enc(_AC_LUMA_BITS, _AC_LUMA_VALS)
        enc_dc_c = make_enc(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        enc_ac_c = make_enc(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        bits = Bits()
        pred = 0
        for _ in range(4):  # four Y blocks of the MCU
            pred = dc_only_block(bits, enc_dc_l, enc_ac_l, sq_y, pred)
        dc_only_block(bits, enc_dc_c, enc_ac_c, sq_cb, 0)
        dc_only_block(bits, enc_dc_c, enc_ac_c, sq_cr, 0)

        sof = struct.pack(">BHHB", 8, 16, 16, 3)
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
        payload = (
            b"\xff\xd8"
            + dqt_seg(0, STD_LUMA_Q)
            + dqt_seg(1, STD_CHROMA_Q)
            + seg(0xC0, sof)
            + dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + dht_seg(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + dht_seg(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + seg(0xDA, sos)
            + bits.bytes()
            + b"\xff\xd9"
        )
        out = decode_jpeg(payload)
        assert out.shape == (16, 16, 3)
        assert (out[:, :, 0] == exp_r).all()
        assert (out[:, :, 1] == exp_g).all()
        assert (out[:, :, 2] == exp_b).all()

    def test_restart_markers_reset_dc_predictor(self):
        """Two grayscale MCUs with DRI=1 and RST0 between them: the
        second block's DC diff is coded from predictor 0, so both
        blocks carry the SAME bits for the same absolute DC."""
        sq = 5
        enc_dc = make_enc(_DC_LUMA_BITS, _DC_LUMA_VALS)
        enc_ac = make_enc(_AC_LUMA_BITS, _AC_LUMA_VALS)
        b1 = Bits()
        dc_only_block(b1, enc_dc, enc_ac, sq, 0)
        b2 = Bits()
        dc_only_block(b2, enc_dc, enc_ac, sq, 0)  # predictor reset to 0

        sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
        sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
        payload = (
            b"\xff\xd8"
            + dqt_seg(0, STD_LUMA_Q)
            + seg(0xC0, sof)
            + dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + seg(0xDD, struct.pack(">H", 1))  # DRI = 1 MCU
            + seg(0xDA, sos)
            + b1.bytes()
            + b"\xff\xd0"  # RST0
            + b2.bytes()
            + b"\xff\xd9"
        )
        out = decode_jpeg(payload)
        want = int(np.clip(np.round(sq * STD_LUMA_Q[0] / 8.0 + 128.0), 0, 255))
        assert out.shape == (8, 16)
        assert (out == want).all()


class TestOracleContract:
    def test_every_even_constant_is_lossless(self):
        """The jpeg_decode_stats oracle predicts mean_intensity == v for
        even v: DC quantizes to the exact integer (v-128)/2 with
        Q[0]=16, so the reconstruction is v itself."""
        for v in range(0, 256, 2):
            img = np.full((8, 16), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert (out == v).all(), v

    def test_stage_integration(self):
        import pyarrow as pa

        from quarrycore_ray.multimodal import DecodeImageStage

        img = np.full((16, 8), 42, np.uint8)
        stage = DecodeImageStage(decode_stub=False)
        out = stage(
            pa.table({"payload": pa.array([encode_jpeg(img)], pa.binary())})
        )
        assert out["width"].to_pylist() == [8]
        assert out["height"].to_pylist() == [16]
        assert out["mean_intensity"].to_pylist() == [42.0]
