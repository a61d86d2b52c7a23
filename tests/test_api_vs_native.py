"""End-to-end contract: the public api (jax tiers) against the native C++
oracle — the framework-level bit-exactness check of SURVEY.md §7
(±1 rounding-boundary flips allowed; see test_native_golden docstring)."""

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu import native


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xACE)
    return rng.integers(0, 256, (64, 128), dtype=np.uint8)


def _agree(a, b, tol_rate=0.002):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    diff = a.astype(np.int16) - b.astype(np.int16)
    assert np.abs(diff).max(initial=0) <= 1
    assert np.count_nonzero(diff) <= max(2, a.size * tol_rate)


def test_api_enc_quant_vs_cpp(img):
    lut = sd.default_quant_lut(50)
    _agree(sd.encode_quantize(img, lut), native.encode_quantize(img, lut))
    _agree(sd.encode_quantize(img, lut, layout="pair"),
           native.encode_quantize(img, lut, layout="pair"))


def test_api_enc_quant32_vs_cpp(img):
    lut = sd.default_quant_lut(50) * 255.0
    _agree(sd.encode_quantize32(img, lut), native.encode_quantize32(img, lut))


def test_api_stereo_vs_cpp(img):
    lut = sd.default_quant_lut(50)
    _agree(sd.encode_quantize_stereo(img, lut),
           native.encode_quantize_stereo(img, lut))


def test_api_decode_vs_cpp(img):
    lut = sd.default_quant_lut(50) * 255.0
    enc = native.encode_quantize32(img, lut)
    _agree(sd.decode_quantize32(enc, lut, 128, 64),
           native.decode_quantize32(enc, lut, 128, 64))
    lut_n = sd.default_quant_lut(50)
    enc_s = native.encode_quantize_stereo(img, lut_n)
    _agree(sd.decode_quantize_stereo(enc_s, lut_n, 128, 64),
           native.decode_quantize_stereo(enc_s, lut_n, 128, 64))


def test_api_strip_range_vs_cpp(img):
    lut = sd.default_quant_lut(50)
    _agree(sd.encode_quantize(img, lut, 16, 31),
           native.encode_quantize(img, lut, 16, 31))
