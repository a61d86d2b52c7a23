"""XLA tier vs NumPy golden: byte-level agreement for every mode/layout."""

import numpy as np
import pytest

from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G
from simd_dct_tpu.kernels import xla_path as X


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xBEEF)
    return rng.integers(0, 256, (64, 128), dtype=np.uint8)


def _agree(a, b, tol_rate=0.001):
    a, b = np.asarray(a), np.asarray(b)
    diff = a.astype(np.int16) - b.astype(np.int16)
    n_bad = np.count_nonzero(diff)
    assert np.abs(diff).max(initial=0) <= 1, "byte diff > 1"
    assert n_bad <= a.size * tol_rate, f"{n_bad}/{a.size} mismatched"


@pytest.mark.parametrize("rounding", ["rne", "scalar", "clamp_first"])
def test_enc_quant(img, rounding):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut, rounding=rounding),
           G.encode_quantize_golden(img, lut, rounding=rounding,
                                    legacy_range=False))


def test_enc_quant_pair(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut, layout="pair"),
           G.encode_quantize_golden(img, lut, layout="pair"))


def test_enc_quant32(img):
    lut = default_quant_lut(50) * 255.0
    _agree(X.encode_quantize32(img, lut),
           G.encode_quantize32_golden(img, lut))


def test_stereo(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize_stereo(img, lut),
           G.encode_quantize_stereo_golden(img, lut))


def test_strip_range(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut, 16, 31),
           G.encode_quantize_golden(img, lut, 16, 31, rounding="rne"))
    _agree(X.encode_quantize_stereo(img, lut, 16, 31),
           G.encode_quantize_stereo_golden(img, lut, 16, 31))
    _agree(X.encode_quantize32(img, lut * 255.0, 16, 31),
           G.encode_quantize32_golden(img, lut * 255.0, 16, 31))


def test_legacy_range(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut, 16, 31, "rne", "scalar", True),
           G.encode_quantize_golden(img, lut, 16, 31, rounding="rne",
                                    legacy_range=True))


def test_decode_roundtrip(img):
    """XLA decode inverts XLA encode to high PSNR (quant-lossy)."""
    lut = default_quant_lut(100)
    for enc, dec, kw in [
        (X.encode_quantize, X.decode_quantize, {}),
        (X.encode_quantize_stereo, X.decode_quantize_stereo, {}),
    ]:
        data = enc(img, lut)
        out = np.asarray(dec(np.asarray(data), lut, 128, 64))
        ref = img if out.shape[0] == 64 else img[:32]
        mse = ((ref.astype(float) - out.astype(float)) ** 2).mean()
        # noise image: quantization-dominated, sanity-level PSNR
        assert 10 * np.log10(255 ** 2 / mse) > 15

    data32 = X.encode_quantize32(img, lut * 255.0)
    out32 = np.asarray(X.decode_quantize32(np.asarray(data32), lut * 255.0, 128, 64))
    mse = ((img[:32].astype(float) - out32.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 15


def test_decode_inverts_golden_encode(img):
    """Cross-backend: golden-encoded bytes decode correctly via XLA."""
    lut = default_quant_lut(100)
    enc = G.encode_quantize_stereo_golden(img, lut)
    dec_x = np.asarray(X.decode_quantize_stereo(enc, lut, 128, 64))
    dec_g = G.decode_quantize_stereo_golden(enc, lut, 128, 64)
    _agree(dec_x, dec_g, tol_rate=0.002)
