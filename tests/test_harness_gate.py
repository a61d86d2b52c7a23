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
