"""Cross-checks: NumPy golden model vs the native C++ golden oracle.

The C++ oracle reproduces the reference butterfly's f32 association order;
the NumPy/JAX side evaluates the same linear map as matmuls.  Float results
can therefore differ in the last ulp, which flips a quantized byte only
when a coefficient lands exactly on a rounding boundary.  We assert:
  * transform-level agreement to tight float tolerance,
  * quantized u8 agreement with at most rare off-by-one mismatches,
  * identical validation behavior (simdDctResult codes).
"""

import numpy as np
import pytest

from simd_dct_tpu import native
from simd_dct_tpu.core import default_quant_lut, dct_basis_np
from simd_dct_tpu.core.golden import (
    encode_quantize_golden, encode_quantize32_golden,
    encode_quantize_stereo_golden,
)


def _mismatch_stats(a, b):
    diff = a.astype(np.int16) - b.astype(np.int16)
    return np.count_nonzero(diff), int(np.abs(diff).max(initial=0))


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xD1CE)
    return rng.integers(0, 256, (64, 128), dtype=np.uint8)


def test_butterfly_vs_matmul_transform(img):
    """C++ butterfly DCT vs matmul DCT on the same blocks: tiny float diff."""
    d = dct_basis_np("float32")
    blocks = (img[:32].reshape(4, 8, 16, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float32) / np.float32(255.0))
    want = np.einsum("uj,njk,vk->nuv", d, blocks, d).reshape(-1, 64)
    got = native.dct2d_blocks(blocks.reshape(-1, 64), "fy")
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("rounding", ["rne", "scalar", "clamp_first"])
def test_enc_quant_matches(img, rounding):
    lut = default_quant_lut(50)
    cpp = native.encode_quantize(img, lut, rounding=rounding)
    py = encode_quantize_golden(img, lut, rounding=rounding,
                                layout="scalar", legacy_range=False)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1, (n_bad, max_diff)
    assert n_bad <= cpp.size * 0.001


def test_enc_quant_pair_layout_matches(img):
    lut = default_quant_lut(50)
    cpp = native.encode_quantize(img, lut, rounding="rne", layout="pair")
    py = encode_quantize_golden(img, lut, rounding="rne", layout="pair")
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_enc_quant_pair_as_written_overlap(img):
    """The as-written SIMD layout self-clobbers; both goldens must agree on
    the exact final bytes (same write order)."""
    lut = default_quant_lut(50)
    cpp = native.encode_quantize(img, lut, rounding="rne",
                                 layout="pair_as_written")
    py = encode_quantize_golden(img, lut, rounding="rne", layout="pair",
                                emulate_overlap_bug=True)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_enc_quant32_matches(img):
    lut = default_quant_lut(50) * 255.0
    cpp = native.encode_quantize32(img, lut)
    py = encode_quantize32_golden(img, lut)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_stereo_matches(img):
    lut = default_quant_lut(50)
    cpp = native.encode_quantize_stereo(img, lut)
    py = encode_quantize_stereo_golden(img, lut)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_strip_range_agreement(img):
    lut = default_quant_lut(50)
    cpp = native.encode_quantize(img, lut, 16, 31)
    py = encode_quantize_golden(img, lut, 16, 31, rounding="rne")
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_validation_codes():
    lut = default_quant_lut(50)
    img = np.zeros((24, 24), np.uint8)  # 24 % 8 == 0 but 24 % 64 != 0
    with pytest.raises(native.NativeGoldenError) as e:
        native.encode_quantize32(img, lut)
    assert e.value.code == 2  # sdr_NotSupported, src/simd_dct.cpp:118
    bad = np.zeros((12, 10), np.uint8)
    with pytest.raises(native.NativeGoldenError) as e:
        native.encode_quantize(bad, lut)
    assert e.value.code == 2  # multiple-of-8 check, src/simd_dct.cpp:98


def test_native_decode32_matches(img):
    lut = default_quant_lut(50) * 255.0
    enc = native.encode_quantize32(img, lut)
    cpp = native.decode_quantize32(enc, lut, 128, 64)
    from simd_dct_tpu.core.golden import decode_quantize32_golden
    py = decode_quantize32_golden(enc, lut, 128, 64)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_native_decode_stereo_matches(img):
    lut = default_quant_lut(50)
    enc = native.encode_quantize_stereo(img, lut)
    cpp = native.decode_quantize_stereo(enc, lut, 128, 64)
    from simd_dct_tpu.core.golden import decode_quantize_stereo_golden
    py = decode_quantize_stereo_golden(enc, lut, 128, 64)
    n_bad, max_diff = _mismatch_stats(cpp, py)
    assert max_diff <= 1 and n_bad <= cpp.size * 0.001


def test_native_decode_rejects_spill_geometry():
    """The decode oracles' output contract is exactly H/2 rows; H%16==8
    (whose last strip would spill past the buffer) must be rejected at
    the guard, not overflow the heap (ASAN-confirmed pre-fix)."""
    import numpy as np
    import pytest
    import simd_dct_tpu as sd
    from simd_dct_tpu import native

    lut = sd.default_quant_lut(50)
    rec = np.zeros(16 * 64, np.uint8)   # sized for the h//2 contract
    for fn, args in (
            (native.decode_quantize32, (rec, lut * 255.0, 64, 24)),
            (native.decode_quantize, (rec, lut, 64, 24)),
            (native.decode_quantize_stereo,
             (np.zeros(24 * 64, np.uint8), lut, 64, 24))):
        with pytest.raises(Exception):
            fn(*args)
