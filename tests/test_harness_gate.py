"""The BASELINE-ladder PSNR gate (round-2 VERDICT next-step 8): the
fused YCbCr pipeline's PSNR must not regress >0.1 dB below the composed
XLA tier at the same tables.  Runs at a small geometry under the Pallas
interpreter on the CPU test env; the full 4K gate runs inside
``python -m simd_dct_tpu.bench.harness`` config 3 on hardware."""

from simd_dct_tpu.bench.harness import psnr_gate


def test_psnr_gate_passes():
    gate = psnr_gate(h2=128, w=512, interpret=True)
    assert gate["pass"], gate
    # sanity on the numbers themselves: smooth correlated RGB at
    # quality 100 must sit comfortably above the decorrelated ~34 dB cap
    assert gate["psnr_db"] > 36.0, gate
    # the f32 fused pipeline computes identical math to the XLA tier
    assert abs(gate["psnr_f32_db"] - gate["ref_psnr_db"]) <= 0.1, gate
    # the bf16 fast path trades a bounded amount by contract
    assert gate["ref_psnr_db"] - gate["psnr_db"] <= 0.5, gate


def test_psnr_gate_detects_regression():
    """The gate must actually FAIL when tightened past the bf16 fast
    path's real daylight (~0.2 dB), proving the comparison is not
    vacuous."""
    gate = psnr_gate(h2=128, w=512, interpret=True, bf16_tol_db=0.0,
                     tol_db=-1.0)
    assert not gate["pass"], gate


def test_rd_curve_monotone_and_modes():
    """RD sweep: in the non-clipping regime, larger quality (coarser
    tables, reference convention) must give monotonically FEWER bits
    and LOWER PSNR; covered modes produce finite sane points."""
    import numpy as np
    from simd_dct_tpu.bench.rd import rd_curve
    from simd_dct_tpu.api import InvalidParameterError
    import pytest
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(128 + 40 * np.sin(xx / 17) * np.cos(yy / 13),
                  0, 255).astype(np.uint8)
    pts = rd_curve(img, (75, 100, 150))
    assert [p.quality for p in pts] == [75.0, 100.0, 150.0]
    bpp = [p.bits_per_px for p in pts]
    ps = [p.psnr_db for p in pts]
    assert bpp[0] > bpp[1] > bpp[2]
    assert ps[0] > ps[1] > ps[2] > 20.0
    assert all(p.raw_bits_per_px == 8.0 for p in pts)
    # every mode's pipeline produces a sane point at one quality
    planes = np.stack([img, (img * 0.8).astype(np.uint8),
                       (img * 0.6).astype(np.uint8)])
    for mode in ("enc-quant", "enc-quant-pair", "enc-quant-stereo",
                 "enc-quant32-ycbcr", "enc-quant32-ycbcr420"):
        src = planes if mode.startswith("enc-quant32-ycbcr") else img
        (pt,) = rd_curve(src, (100,), mode=mode)
        assert pt.psnr_db > 20.0 and 0 < pt.bits_per_px <             pt.raw_bits_per_px, (mode, pt)
    # 420: 1.5 record bytes per TOP-view px over 3 source channels
    (pt,) = rd_curve(planes, (100,), mode="enc-quant32-ycbcr420")
    assert pt.raw_bits_per_px == 4.0
    with pytest.raises(InvalidParameterError):
        rd_curve(img, (100,), mode="enc-quant64")
