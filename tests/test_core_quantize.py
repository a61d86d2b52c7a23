"""Tests for quantization semantics and the golden model's self-consistency."""

import numpy as np
import jax.numpy as jnp

from simd_dct_tpu.core import (
    default_quant_lut, quant_scales, dequant_scales,
    quantize_to_u8, dequantize_from_u8, BASE_QUANT_TABLE,
)
from simd_dct_tpu.core.golden import (
    encode_quantize_golden, decode_quantize_golden,
    encode_quantize32_golden, decode_quantize32_golden,
    encode_quantize_stereo_golden, decode_quantize_stereo_golden,
    pair_cell_permutation,
)


def test_default_lut_quality_scaling():
    lut = default_quant_lut()
    np.testing.assert_array_equal(lut, BASE_QUANT_TABLE)
    lut50 = default_quant_lut(50)
    np.testing.assert_allclose(lut50, BASE_QUANT_TABLE * np.float32(50))


def test_quant_scales_roundtrip():
    lut = default_quant_lut(50)
    s = np.asarray(quant_scales(lut))
    inv = np.asarray(dequant_scales(lut))
    np.testing.assert_allclose(s * inv, 1.0, rtol=1e-6)


def test_quantize_rounding_modes():
    scales = jnp.ones(5, jnp.float32)
    # RNE: 0.5 -> 0, 1.5 -> 2 (ties to even); then +127.
    c = jnp.asarray([0.5, 1.5, -0.5, 200.0, -200.0], jnp.float32)
    out = np.asarray(quantize_to_u8(c, scales, "rne"))
    np.testing.assert_array_equal(out, [127, 129, 127, 255, 0])
    # scalar: roundf == half away from zero in the /255 domain.
    out_s = np.asarray(quantize_to_u8(c, scales, "scalar"))
    np.testing.assert_array_equal(out_s, [128, 129, 127, 255, 0])
    # clamp_first clamps the biased float before converting (RNE on the
    # biased value: 127.5 -> 128, 128.5 -> 128, 126.5 -> 126).
    out_c = np.asarray(quantize_to_u8(c, scales, "clamp_first"))
    np.testing.assert_array_equal(out_c, [128, 128, 126, 255, 0])


def test_dequantize_inverts_bias():
    lut = default_quant_lut(50)
    inv = dequant_scales(lut)
    data = jnp.asarray(np.arange(64, dtype=np.uint8))
    c = dequantize_from_u8(data, inv)
    assert np.asarray(c).shape == (64,)
    # byte 127 decodes to exactly 0.
    zero = dequantize_from_u8(jnp.full((64,), 127, jnp.uint8), inv)
    np.testing.assert_array_equal(np.asarray(zero), np.zeros(64))


def test_pair_cell_permutation_bijective():
    perm = pair_cell_permutation()
    flat = perm.reshape(-1)
    assert sorted(flat.tolist()) == list(range(128))
    # As-written variant overlaps by design (offsets up to 191).
    buggy = pair_cell_permutation(as_written=True)
    assert buggy.max() == 191



def _smooth_image(rng, h, w):
    """Gradient + low-frequency sinusoid + mild noise: a compressible image
    (white noise is incompressible and bounds PSNR near 25 dB regardless of
    codec quality)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = (128 + 40 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
           + 20 * (xx / max(w - 1, 1)) + rng.normal(0, 2, (h, w)))
    return np.clip(img, 0, 255).astype(np.uint8)

class TestGoldenRoundTrips:
    """Encode->decode through the golden model recovers the image
    (losslessly at quality where quant steps resolve all values is not
    possible with +-127 bias u8; we assert high PSNR instead, and exact
    layout inversion at the byte level)."""

    def _psnr(self, a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else np.inf

    def test_enc_quant_roundtrip(self, rng):
        img = _smooth_image(rng, 32, 32)
        # quality 100 => q_DC = 255/(17*0.95) ~ 15.8, so even a full-white
        # block's DC (8.0) maps to 126+127 < 255: no saturation.
        lut = default_quant_lut(100.0)
        enc = encode_quantize_golden(img, lut)
        dec = decode_quantize_golden(enc, lut, 32, 32)
        assert dec.shape == (16, 32)
        assert self._psnr(img[:16], dec) > 30

    def test_enc_quant_pair_layout_same_bytes(self, rng):
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        lut = default_quant_lut(1.0)
        scalar = encode_quantize_golden(img, lut, rounding="rne", layout="scalar")
        pair = encode_quantize_golden(img, lut, rounding="rne", layout="pair")
        # Same multiset of bytes per pair cell, different arrangement.
        perm = pair_cell_permutation()
        w = 32
        for s in range(1):
            for t in range(w // 16):
                cell = pair[s * 8 * w + t * 128: s * 8 * w + (t + 1) * 128]
                b0 = scalar[s * 8 * w + (2 * t) * 64: s * 8 * w + (2 * t) * 64 + 64]
                b1 = scalar[s * 8 * w + (2 * t + 1) * 64: s * 8 * w + (2 * t + 1) * 64 + 64]
                np.testing.assert_array_equal(cell[perm[0]], b0)
                np.testing.assert_array_equal(cell[perm[1]], b1)

    def test_enc_quant32_roundtrip(self, rng):
        img = _smooth_image(rng, 32, 64)
        # Mode32 works in the raw 0..255 domain (src/simd_dct.cpp:2033-2036
        # applies 255/(lut*vr) to UN-normalized coefficients); a matched LUT
        # must be 255x hotter for the same effective step size.
        lut = default_quant_lut(100.0) * 255.0
        enc = encode_quantize32_golden(img, lut)
        dec = decode_quantize32_golden(enc, lut, 64, 32)
        assert dec.shape == (16, 64)
        assert self._psnr(img[:16], dec) > 30

    def test_stereo_roundtrip(self, rng):
        img = _smooth_image(rng, 32, 32)
        lut = default_quant_lut(100.0)
        enc = encode_quantize_stereo_golden(img, lut)
        assert enc.size == 32 * 32
        dec = decode_quantize_stereo_golden(enc, lut, 32, 32)
        assert dec.shape == (32, 32)
        assert self._psnr(img, dec) > 30

    def test_strip_range_semantics(self, rng):
        """startY/endY: strip included iff startY <= 2*y <= endY
        (src/simd_dct.cpp:1686-1696); excluded strips stay zero."""
        img = rng.integers(1, 256, (64, 32), dtype=np.uint8)
        lut = default_quant_lut(1.0)
        full = encode_quantize_golden(img, lut, rounding="rne")
        part = encode_quantize_golden(img, lut, 16, 31, rounding="rne")
        w = 32
        # strip y=0: 0*2 < 16 -> skipped; strip y=8: 16 <= 16 <= 31 -> kept;
        # strip y=16: 32 > 31 -> stopped.
        assert np.all(part[:8 * w] == 0)
        np.testing.assert_array_equal(part[8 * w:16 * w], full[8 * w:16 * w])
        assert np.all(part[16 * w:] == 0)

    def test_legacy_range_quirk(self, rng):
        """NoSimd enc-quant compares y (not 2y) against startY/endY
        (src/simd_dct.cpp:377,384)."""
        img = rng.integers(1, 256, (64, 32), dtype=np.uint8)
        lut = default_quant_lut(1.0)
        part = encode_quantize_golden(img, lut, 16, 31, rounding="scalar",
                                      layout="scalar", legacy_range=True)
        w = 32
        # y=0,8 skipped (y < 16); y=16,24 kept (16 <= y <= 31).
        assert np.all(part[:16 * w] == 0)
        assert np.any(part[16 * w:] != 0)
