"""Cross-geometry api coverage: panel-aligned and generic shapes, all modes
agree with the golden model within the rounding-boundary contract."""

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu.core import golden as G


GEOMETRIES = [
    (16, 64),      # minimal mode32-capable
    (32, 128),     # small generic
    (256, 128),    # panel-aligned H, single chunk
    (256, 384),    # panel-aligned H, 3 chunks
    (272, 192),    # odd strip count, non-chunk width (generic path)
]


def _agree(a, b, tol_rate=0.02):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    diff = a.astype(np.int16) - b.astype(np.int16)
    assert np.abs(diff).max(initial=0) <= 1
    assert np.count_nonzero(diff) <= max(4, a.size * tol_rate)


@pytest.mark.parametrize("h,w", GEOMETRIES)
def test_all_modes_all_geometries(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    lut = sd.default_quant_lut(50)
    _agree(sd.encode_quantize(img, lut),
           G.encode_quantize_golden(img, lut, rounding="rne",
                                    legacy_range=False))
    _agree(sd.encode_quantize_stereo(img, lut),
           G.encode_quantize_stereo_golden(img, lut))
    if w % 64 == 0:
        _agree(sd.encode_quantize32(img, lut * 255.0),
               G.encode_quantize32_golden(img, lut * 255.0))


def _agree_loose(a, b, tol_rate, max_diff=1):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    diff = a.astype(np.int16) - b.astype(np.int16)
    assert np.abs(diff).max(initial=0) <= max_diff
    assert np.count_nonzero(diff) <= max(4, a.size * tol_rate)


@pytest.mark.parametrize("h,w", [(16, 64), (32, 128), (272, 192),
                                 (144, 320)])
def test_pallas_coverage_unaligned(h, w):
    """Round 2: unaligned geometries reach the fused kernels through the
    pad-and-slice coverage wrappers — every mode at tier=pallas (under
    the interpreter on CPU) agrees with the golden, and decode inverts
    the padded encode byte stream."""
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    lut = sd.default_quant_lut(100)
    lut32 = lut * 255.0
    kw = dict(backend="pallas", pallas_interpret=True)
    e1 = sd.encode_quantize(img, lut, **kw)
    _agree_loose(e1, G.encode_quantize_golden(img, lut, rounding="rne",
                                              legacy_range=False), 0.03)
    e3 = sd.encode_quantize_stereo(img, lut, **kw)
    _agree_loose(e3, G.encode_quantize_stereo_golden(img, lut), 0.03)
    e2 = sd.encode_quantize32(img, lut32, **kw)
    _agree_loose(e2, G.encode_quantize32_golden(img, lut32), 0.03)
    d1 = sd.decode_quantize(np.asarray(e1), lut, w, h, **kw)
    _agree_loose(d1, sd.decode_quantize(np.asarray(e1), lut, w, h,
                                        backend="xla"), 0.5, max_diff=2)
    d2 = sd.decode_quantize32(np.asarray(e2), lut32, w, h, **kw)
    _agree_loose(d2, sd.decode_quantize32(np.asarray(e2), lut32, w, h,
                                          backend="xla"), 0.5, max_diff=2)
    d3 = sd.decode_quantize_stereo(np.asarray(e3), lut, w, h, **kw)
    _agree_loose(d3, sd.decode_quantize_stereo(np.asarray(e3), lut, w, h,
                                               backend="xla"), 0.5,
                 max_diff=2)
    rt = sd.roundtrip_quantize32(img, lut32, **kw)
    _agree_loose(rt, np.asarray(d2), 0.5, max_diff=2)


def test_pallas_coverage_scalar_and_as_written():
    """The pad-and-slice path preserves the per-layout byte contracts."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 192), dtype=np.uint8)
    lut = sd.default_quant_lut(100)
    kw = dict(backend="pallas", pallas_interpret=True)
    for layout in ("scalar", "pair", "pair_as_written"):
        got = sd.encode_quantize(img, lut, layout=layout, **kw)
        _agree_loose(got, sd.encode_quantize(img, lut, layout=layout,
                                             backend="numpy"), 0.03)


@pytest.mark.parametrize("h,w", [(256, 128), (32, 128)])
def test_decode_inverts_encode_across_paths(h, w):
    """api decode inverts api encode on both panel and generic paths."""
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(128 + 40 * np.sin(xx / 9) * np.cos(yy / 7), 0,
                  255).astype(np.uint8)
    lut = sd.default_quant_lut(100)
    for enc, dec, scale in [
        (sd.encode_quantize, sd.decode_quantize, 1.0),
        (sd.encode_quantize32, sd.decode_quantize32, 255.0),
    ]:
        e = np.asarray(enc(img, lut * scale))
        d = np.asarray(dec(e, lut * scale, w, h))
        mse = ((img[: h // 2].astype(float) - d.astype(float)) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / mse) > 30
    e = np.asarray(sd.encode_quantize_stereo(img, lut))
    d = np.asarray(sd.decode_quantize_stereo(e, lut, w, h))
    mse = ((img.astype(float) - d.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30
