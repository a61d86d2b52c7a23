"""Strict-IEEE compat tier: ZERO byte mismatches vs the C++ oracle.

Round-1 VERDICT item 3: every other tier agrees with the oracle only
statistically (±1 on rounding-boundary bytes); the compat engine must be
byte-identical for all 3 modes × 3 roundings, on both the NumPy butterfly
golden and the staged-jit jax engine.
"""

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu import native
from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G
from simd_dct_tpu.core import butterfly as B
from simd_dct_tpu.kernels import compat as C

ROUNDINGS = ["rne", "scalar", "clamp_first"]


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xE4AC)
    return rng.integers(0, 256, (64, 128), dtype=np.uint8)


@pytest.fixture(scope="module")
def lut():
    return default_quant_lut(50)


def test_butterfly_numpy_bitexact_transform(img):
    """NumPy butterfly DCT == C++ oracle butterfly, bit for bit."""
    blocks = (img.reshape(8, 8, 16, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float32) / np.float32(255.0))
    for orient, fn in [("fx", B.dct2d_fx_major), ("fy", B.dct2d_fy_major)]:
        got = fn(blocks).reshape(-1, 64)
        want = native.dct2d_blocks(blocks.reshape(-1, 64).copy(), orient)
        assert np.array_equal(got.view(np.uint32), want.view(np.uint32)), orient


@pytest.mark.parametrize("rounding", ROUNDINGS)
@pytest.mark.parametrize("engine", ["numpy", "jax"])
def test_enc_quant_exact(img, lut, rounding, engine):
    want = native.encode_quantize(img, lut, rounding=rounding)
    if engine == "numpy":
        got = G.encode_quantize_golden(img, lut, rounding=rounding,
                                       legacy_range=False, compat=True)
    else:
        import jax.numpy as jnp
        got = np.asarray(C.encode_quantize(jnp.asarray(img), lut,
                                           rounding=rounding))
    assert int((got != want).sum()) == 0


@pytest.mark.parametrize("rounding", ROUNDINGS)
@pytest.mark.parametrize("engine", ["numpy", "jax"])
def test_enc_quant32_exact(img, lut, rounding, engine):
    lut32 = lut * 255.0
    want = native.encode_quantize32(img, lut32, rounding=rounding)
    if engine == "numpy":
        got = G.encode_quantize32_golden(img, lut32, rounding=rounding,
                                         compat=True)
    else:
        import jax.numpy as jnp
        got = np.asarray(C.encode_quantize32(jnp.asarray(img), lut32,
                                             rounding=rounding))
    assert int((got != want).sum()) == 0


@pytest.mark.parametrize("rounding", ROUNDINGS)
@pytest.mark.parametrize("engine", ["numpy", "jax"])
def test_stereo_exact(img, lut, rounding, engine):
    want = native.encode_quantize_stereo(img, lut, rounding=rounding)
    if engine == "numpy":
        got = G.encode_quantize_stereo_golden(img, lut, rounding=rounding,
                                              compat=True)
    else:
        import jax.numpy as jnp
        got = np.asarray(C.encode_quantize_stereo(jnp.asarray(img), lut,
                                                  rounding=rounding))
    assert int((got != want).sum()) == 0


def test_pair_layout_exact(img, lut):
    want = native.encode_quantize(img, lut, rounding="rne", layout="pair")
    import jax.numpy as jnp
    got = np.asarray(C.encode_quantize(jnp.asarray(img), lut,
                                       rounding="rne", layout="pair"))
    assert int((got != want).sum()) == 0


def test_api_compat_flag_routes(img, lut):
    """api-level compat=True is byte-identical to the oracle on both the
    numpy tier and the jax cascade, including via EncoderConfig."""
    want = native.encode_quantize(img, lut)
    for backend in (None, "xla", "numpy"):
        got = np.asarray(sd.encode_quantize(img, lut, backend=backend,
                                            compat=True))
        assert int((got != want).sum()) == 0, backend
    enc = sd.Encoder(sd.EncoderConfig(quality=50, compat=True))
    got = np.asarray(enc.encode_quantize(img))
    want_q50 = native.encode_quantize(img, default_quant_lut(50))
    assert int((got != want_q50).sum()) == 0


def test_api_compat_strip_range(img, lut):
    """compat path honors the startY/endY strip-range contract."""
    want = native.encode_quantize(img, lut, 16, 31)
    got = np.asarray(sd.encode_quantize(img, lut, 16, 31, backend="xla",
                                        compat=True))
    # the oracle leaves excluded strips untouched (zeros here since the
    # buffer starts zeroed); compat zero-fills — identical on a fresh buffer
    assert int((got != want).sum()) == 0


def test_pair_as_written_partial_range_spill(img, lut):
    """An included strip's last as-written cell spills 64 bytes into the
    following EXCLUDED strip (src/simd_dct.cpp:1662-1670 overlap + cursor
    advance); every tier must reproduce the oracle's surviving bytes."""
    import jax.numpy as jnp
    h, w = img.shape
    start_y, end_y = 0, 15          # strip 0 included, strips 1+ excluded
    want = native.encode_quantize(img, lut, start_y, end_y,
                                  layout="pair_as_written")
    spill = want[8 * w: 8 * w + 64]
    assert spill.any(), "test needs a nonzero spill to be meaningful"
    g = G.encode_quantize_golden(img, lut, start_y, end_y,
                                 layout="pair_as_written", compat=True,
                                 legacy_range=False)
    assert int((g != want).sum()) == 0
    got_c = np.asarray(sd.encode_quantize(img, lut, start_y, end_y,
                                          layout="pair_as_written",
                                          backend="xla", compat=True))
    assert int((got_c != want).sum()) == 0
    # non-compat tiers: same bytes up to the usual +-1 rounding contract
    for kw in (dict(backend="xla"),
               dict(backend="pallas", pallas_interpret=True)):
        got = np.asarray(sd.encode_quantize(img, lut, start_y, end_y,
                                            layout="pair_as_written", **kw))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max(initial=0) <= 1, kw
        assert got[8 * w: 8 * w + 64].any(), f"spill missing: {kw}"


def test_exact_roundf_edge():
    """floor(v+0.5) != roundf when v+0.5 rounds up across an integer; the
    compat quantizer must implement true roundf."""
    # v = largest f32 strictly below 0.5: roundf -> 0, floor(v+0.5) -> 1.0
    v = np.float32(np.nextafter(np.float32(0.5), np.float32(0.0)))
    assert np.floor(v + np.float32(0.5)) == 1.0  # the naive shortcut fails
    got = B._roundf_nonneg(np.array([v], np.float32))
    assert got[0] == 0.0


# ---- decode exactness (north-star inverse; oracle = the C++ decode) ------

@pytest.mark.parametrize("layout", ["scalar", "pair"])
def test_decode_quantize_exact(img, lut, layout):
    h, w = img.shape
    rec = native.encode_quantize(img, lut, rounding="rne", layout=layout)
    want = native.decode_quantize(rec, lut, w, h, layout=layout)
    got = np.asarray(C.decode_quantize(rec, lut, w, h, layout=layout))
    assert int((got != want).sum()) == 0


def test_decode_quantize32_exact(img, lut):
    h, w = img.shape
    lut32 = lut * 255.0
    rec = native.encode_quantize32(img, lut32, rounding="rne")
    want = native.decode_quantize32(rec, lut32, w, h)
    got = np.asarray(C.decode_quantize32(rec, lut32, w, h))
    assert int((got != want).sum()) == 0


def test_decode_stereo_exact(img, lut):
    h, w = img.shape
    rec = native.encode_quantize_stereo(img, lut, rounding="rne")
    want = native.decode_quantize_stereo(rec, lut, w, h)
    got = np.asarray(C.decode_quantize_stereo(rec, lut, w, h))
    assert int((got != want).sum()) == 0


def test_decode_pair_as_written_rejected(img, lut):
    with pytest.raises(ValueError):
        C.decode_quantize(np.zeros(64, np.uint8), lut, 8, 16,
                          layout="pair_as_written")
    with pytest.raises(native.NativeGoldenError):
        native.decode_quantize(np.zeros(64, np.uint8), lut, 8, 16,
                               layout="pair_as_written")


def test_api_compat_decode_routes(img, lut):
    h, w = img.shape
    rec = native.encode_quantize(img, lut, rounding="rne")
    want = native.decode_quantize(rec, lut, w, h)
    got = np.asarray(sd.api.decode_quantize(rec, lut, w, h, compat=True))
    assert int((got != want).sum()) == 0
    lut32 = lut * 255.0
    rec32 = native.encode_quantize32(img, lut32, rounding="rne")
    want32 = native.decode_quantize32(rec32, lut32, w, h)
    got32 = np.asarray(sd.api.decode_quantize32(rec32, lut32, w, h,
                                                compat=True))
    assert int((got32 != want32).sum()) == 0
    recs = native.encode_quantize_stereo(img, lut, rounding="rne")
    wants = native.decode_quantize_stereo(recs, lut, w, h)
    gots = np.asarray(sd.api.decode_quantize_stereo(recs, lut, w, h,
                                                    compat=True))
    assert int((gots != wants).sum()) == 0
