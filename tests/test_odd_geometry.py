"""Odd dual-view geometry (H % 16 == 8): the reference's spill semantics,
reproduced in the goldens + C++ oracle so the api-level rejection is a
documented, testable deviation (SURVEY.md §7 "odd geometry rules";
round-1 VERDICT missing item 4)."""

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu import native
from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0x0DD)
    return rng.integers(0, 256, (40, 64), dtype=np.uint8)  # H % 16 == 8


def test_spill_output_size(img):
    """H=40 -> H/2=20 -> strips y=0,8,16; the y=16 strip reads rows 16..24
    (4 rows into the second view) and output is 24*W bytes, not 20*W."""
    lut = default_quant_lut(50)
    out = G.encode_quantize_golden(img, lut, compat=True)
    assert out.size == 24 * 64
    cpp = native.encode_quantize(img, lut)
    assert cpp.size == 24 * 64
    assert int((out != cpp).sum()) == 0


def test_spill_reads_across_view_boundary(img):
    """The spill strip's bytes depend on second-view pixels."""
    lut = default_quant_lut(50)
    base = G.encode_quantize_golden(img, lut, compat=True)
    mod = img.copy()
    mod[21, :] ^= 0xFF  # row 21 = second view row 1, inside the spill strip
    changed = G.encode_quantize_golden(mod, lut, compat=True)
    assert not np.array_equal(base[16 * 64:], changed[16 * 64:])
    np.testing.assert_array_equal(base[: 16 * 64], changed[: 16 * 64])


def test_spill_mode32(img):
    lut = default_quant_lut(50) * 255.0
    out = G.encode_quantize32_golden(img, lut, compat=True)
    cpp = native.encode_quantize32(img, lut)
    assert out.size == cpp.size == 24 * 64
    assert int((out != cpp).sum()) == 0


def test_api_spill_opt_in(img):
    """api spill=True reproduces the oracle's spill bytes on every tier
    (round 2: SURVEY §7 'do both, defaulting to native' — the api half)."""
    lut = default_quant_lut(50)
    want = native.encode_quantize(img, lut)
    got_c = np.asarray(sd.encode_quantize(img, lut, backend="xla",
                                          compat=True, spill=True))
    assert got_c.size == 24 * 64
    assert int((got_c != want).sum()) == 0
    for kw in (dict(backend="numpy"), dict(backend="xla"),
               dict(backend="pallas", pallas_interpret=True)):
        got = np.asarray(sd.encode_quantize(img, lut, spill=True, **kw))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert got.size == want.size and diff.max(initial=0) <= 1, kw
    want32 = native.encode_quantize32(img, lut * 255.0)
    got32 = np.asarray(sd.encode_quantize32(img, lut * 255.0, spill=True,
                                            backend="xla", compat=True))
    assert int((got32 != want32).sum()) == 0
    # default stays native: rejected without the opt-in
    import pytest as _pytest
    with _pytest.raises(sd.NotSupportedError):
        sd.encode_quantize(img, lut)


def test_stereo_odd_height_rejected_everywhere(img):
    """Stereo with H % 16 == 8 would read past the input buffer in the
    reference (src/simd_dct.cpp:292) — UB, rejected by golden and oracle."""
    lut = default_quant_lut(50)
    with pytest.raises(ValueError, match="H % 16"):
        G.encode_quantize_stereo_golden(img, lut)
    with pytest.raises(native.NativeGoldenError):
        native.encode_quantize_stereo(img, lut)


def test_stereo_spill_opt_in(img):
    """Round-3 (round-2 VERDICT missing #1): stereo spill=True accepts
    H % 16 == 8 and reproduces the reference's spill strip where its
    reads are DEFINED — the left eye's spill rows read 4 rows into the
    right eye (contiguous in the caller's buffer, deterministic).  The
    right eye's spill rows are OOB in the reference (real UB,
    src/simd_dct.cpp:1073); they are substituted with zero rows.  The
    emulation must equal the oracle run on that synthetic dual view."""
    lut = default_quant_lut(50)
    # independently-constructed synthetic dual view: R = 24 rows/eye
    left = img[:24]                              # 20 left + 4 right rows
    right = np.vstack([img[20:], np.zeros((4, 64), np.uint8)])
    synthetic = np.vstack([left, right])
    want = native.encode_quantize_stereo(synthetic, lut)
    got_c = np.asarray(sd.encode_quantize_stereo(
        img, lut, backend="xla", compat=True, spill=True))
    assert got_c.size == 2 * 24 * 64
    assert int((got_c != want).sum()) == 0
    for kw in (dict(backend="numpy"), dict(backend="xla"),
               dict(backend="pallas", pallas_interpret=True)):
        got = np.asarray(sd.encode_quantize_stereo(img, lut, spill=True,
                                                   **kw))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert got.size == want.size and diff.max(initial=0) <= 1, kw
    # without the opt-in the rejection stands
    with pytest.raises(sd.NotSupportedError, match="H % 16"):
        sd.encode_quantize_stereo(img, lut)


def test_api_still_rejects_by_design(img):
    """The public api keeps the explicit rejection (documented deviation)."""
    with pytest.raises(sd.NotSupportedError, match="H % 16"):
        sd.encode_quantize(img, default_quant_lut(50))
