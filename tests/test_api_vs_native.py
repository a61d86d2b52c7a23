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


def test_two_pass_strip_composition(img):
    """Round-1 VERDICT item 6: the try_* wrappers leave excluded strips
    UNTOUCHED (reference cursor-advance semantics, src/simd_dct.cpp:
    1075-1083), so two partial passes into one buffer byte-match the C++
    oracle run twice into one buffer (compat engine => exact)."""
    lut = sd.default_quant_lut(50)
    h, w = img.shape
    for mode, try_fn, native_fn, nbytes in [
        ("quant", sd.api.try_encode_quantize, native.encode_quantize,
         (h // 2) * w),
        ("quant32", sd.api.try_encode_quantize32, native.encode_quantize32,
         (h // 2) * w),
        ("stereo", sd.api.try_encode_quantize_stereo,
         native.encode_quantize_stereo, h * w),
    ]:
        kw = dict(compat=True)
        lut_m = lut * 255.0 if mode == "quant32" else lut
        sentinel = np.full(nbytes, 0xAB, np.uint8)
        ours = sentinel.copy()
        rc1 = try_fn(img, ours, lut_m, w, h, 0, 15, **kw)
        rc2 = try_fn(img, ours, lut_m, w, h, 48, 63, **kw)
        assert rc1 == rc2 == sd.SimdDctResult.SUCCESS
        oracle = sentinel.copy()
        native_fn(img, lut_m, 0, 15, out=oracle)
        native_fn(img, lut_m, 48, 63, out=oracle)
        assert np.array_equal(ours, oracle), mode
        # and the sentinel actually survived somewhere (strips 1-2 excluded)
        assert (ours == 0xAB).any(), mode
