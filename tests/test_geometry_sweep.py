"""Seeded randomized geometry sweep: every mode x tier pair must agree
on arbitrary contract-valid sizes (the deterministic spot checks in the
per-mode suites pin known shapes; this sweep guards the pad-and-slice /
non-dividing-grid machinery against regressions at shapes nobody
hand-picked).  Cross-tier contract: golden(f32) vs pallas-interpret
(bf16) within ±1; xla vs golden exact-or-±1 per the documented rounding
boundaries."""

import numpy as np
import pytest

from simd_dct_tpu import api
from simd_dct_tpu.core import default_quant_lut

_RNG = np.random.default_rng(0x9E0)


def _geoms(w_unit, count=3):
    """Random (H, W): H % 16 == 0, W a multiple of the mode's unit."""
    out = []
    for _ in range(count):
        h = 16 * int(_RNG.integers(2, 16))
        w = w_unit * int(_RNG.integers(1, 1024 // w_unit + 1))
        out.append((h, w))
    return out


@pytest.mark.parametrize("h,w", _geoms(64))
def test_sweep_mode32(h, w):
    img = _RNG.integers(0, 256, (h, w), dtype=np.uint8)
    lut = default_quant_lut(80) * 255.0
    g = np.asarray(api.encode_quantize32(img, lut, backend="numpy"))
    p = np.asarray(api.encode_quantize32(img, lut, backend="pallas",
                                         pallas_interpret=True))
    assert np.abs(g.astype(np.int16) - p.astype(np.int16)).max() <= 1
    dec = np.asarray(api.decode_quantize32(p, lut, w, h, backend="pallas",
                                           pallas_interpret=True))
    assert dec.shape == (h // 2, w)


@pytest.mark.parametrize("h,w", _geoms(16))
def test_sweep_pair(h, w):
    img = _RNG.integers(0, 256, (h, w), dtype=np.uint8)
    lut = default_quant_lut(80)
    g = np.asarray(api.encode_quantize(img, lut, layout="pair",
                                       backend="numpy"))
    p = np.asarray(api.encode_quantize(img, lut, layout="pair",
                                       backend="pallas",
                                       pallas_interpret=True))
    assert np.abs(g.astype(np.int16) - p.astype(np.int16)).max() <= 1
    dec = np.asarray(api.decode_quantize(p, lut, w, h, layout="pair",
                                         backend="pallas",
                                         pallas_interpret=True))
    assert dec.shape == (h // 2, w)


@pytest.mark.parametrize("h,w", _geoms(8))
def test_sweep_stereo_native(h, w):
    img = _RNG.integers(0, 256, (h, w), dtype=np.uint8)
    lut = default_quant_lut(80)
    g = np.asarray(api.encode_quantize_stereo(img, lut,
                                              view_layout="native",
                                              backend="numpy"))
    p = np.asarray(api.encode_quantize_stereo(img, lut,
                                              view_layout="native",
                                              backend="pallas",
                                              pallas_interpret=True))
    assert g.shape == p.shape == (2, 64, h // 16,
                                  api._stereo_native_bwp(w))
    assert np.abs(g.astype(np.int16) - p.astype(np.int16)).max() <= 1
    assert (p[..., -(api._stereo_native_bwp(w) - w // 8):] == 127).all() \
        or api._stereo_native_bwp(w) == w // 8
    dec = np.asarray(api.decode_quantize_stereo(
        p, lut, w, h, view_layout="native", backend="pallas",
        pallas_interpret=True))
    assert dec.shape == (h, w)
