"""Pallas kernel correctness in interpreter mode (CPU-runnable).

The compiled-TPU path is exercised by bench.py / the graft entry on real
hardware; here the same kernel bodies run under the Pallas interpreter and
must agree with the golden model byte-for-byte (up to float
rounding-boundary flips).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G
from simd_dct_tpu.kernels import pallas_dct as PK


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xFADE)
    return rng.integers(0, 256, (256, 128), dtype=np.uint8)


def _agree(a, b, tol_rate=0.002):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    diff = a.astype(np.int16) - b.astype(np.int16)
    assert np.abs(diff).max(initial=0) <= 1
    assert np.count_nonzero(diff) <= max(2, a.size * tol_rate)


def test_supports():
    assert PK.supports(256, 128)
    assert PK.supports(192, 128)       # any H2 % 8 == 0: non-dividing grid
    assert not PK.supports(256, 192)   # W % 128 != 0 needs pad-and-slice
    assert not PK.supports(40, 128)    # H % 16 != 0 (dual-view contract)


def test_enc32_interpret(img):
    lut = default_quant_lut(50) * 255.0
    got = PK.encode_quantize32(jnp.asarray(img), lut, interpret=True,
                               precision="f32")
    _agree(got, G.encode_quantize32_golden(img, lut))


def test_enc32_bf16_interpret(img):
    """bf16 MXU-operand mode: same bytes within the looser +-1 contract
    (~1-2% rounding-boundary flips vs the f32 golden)."""
    lut = default_quant_lut(50) * 255.0
    got = PK.encode_quantize32(jnp.asarray(img), lut, interpret=True,
                               precision="bf16")
    _agree(got, G.encode_quantize32_golden(img, lut), tol_rate=0.03)


def test_enc32_strip_range_interpret(img):
    lut = default_quant_lut(50) * 255.0
    got = PK.encode_quantize32(jnp.asarray(img), lut, 32, 63, interpret=True,
                               precision="f32")
    _agree(got, G.encode_quantize32_golden(img, lut, 32, 63))


def test_dec32_interpret(img):
    lut = default_quant_lut(50) * 255.0
    enc = G.encode_quantize32_golden(img, lut)
    got = PK.decode_quantize32(enc, lut, 128, 256, interpret=True,
                               precision="f32")
    want = G.decode_quantize32_golden(enc, lut, 128, 256)
    _agree(got, want)


def test_enc32_rounding_variants(img):
    lut = default_quant_lut(50) * 255.0
    for rounding in ("rne", "clamp_first", "scalar"):
        got = PK.encode_quantize32(jnp.asarray(img), lut,
                                   rounding=rounding, interpret=True,
                                   precision="f32")
        _agree(got, G.encode_quantize32_golden(img, lut, rounding=rounding))


def test_roundtrip_fused_equals_composed(img):
    """The fused encode->decode kernel must match the composed pair
    bit-exactly on the same backend (here: interpret mode)."""
    lut = default_quant_lut(100) * 255.0
    fused = np.asarray(PK.roundtrip_quantize32(jnp.asarray(img), lut,
                                               interpret=True,
                                               precision="f32"))
    rec = PK.encode_quantize32(jnp.asarray(img), lut, interpret=True,
                               precision="f32")
    composed = np.asarray(PK.decode_quantize32(
        np.asarray(rec), lut, img.shape[1], img.shape[0],
        interpret=True, precision="f32"))
    np.testing.assert_array_equal(fused, composed)


def test_roundtrip_psnr_parity(img):
    """Fused round-trip PSNR within 0.3 dB of the golden composition."""
    lut = default_quant_lut(100) * 255.0
    fused = np.asarray(PK.roundtrip_quantize32(jnp.asarray(img), lut,
                                               interpret=True,
                                               precision="f32"))
    gold = G.decode_quantize32_golden(
        G.encode_quantize32_golden(img, lut), lut,
        img.shape[1], img.shape[0])
    ref = img[: img.shape[0] // 2].astype(float)

    def psnr(x):
        mse = ((ref - x.astype(float)) ** 2).mean()
        return 10 * np.log10(255 ** 2 / mse)

    assert abs(psnr(fused) - psnr(gold)) < 0.3


class TestHybridModes:
    """Hybrid pallas-tiles + XLA-permute paths for enc-quant and stereo."""

    def test_enc_quant_hybrid(self, img):
        lut = default_quant_lut(50)
        for layout in ("scalar", "pair"):
            got = PK.encode_quantize(jnp.asarray(img), lut, layout=layout,
                                     interpret=True, precision="f32")
            _agree(got, G.encode_quantize_golden(img, lut, rounding="rne",
                                                 layout=layout))

    def test_enc_quant_hybrid_range(self, img):
        lut = default_quant_lut(50)
        got = PK.encode_quantize(jnp.asarray(img), lut, 32, 63,
                                 interpret=True, precision="f32")
        _agree(got, G.encode_quantize_golden(img, lut, 32, 63,
                                             rounding="rne"))

    def test_stereo_hybrid(self, img):
        lut = default_quant_lut(50)
        got = PK.encode_quantize_stereo(jnp.asarray(img), lut,
                                        interpret=True, precision="f32")
        _agree(got, G.encode_quantize_stereo_golden(img, lut))

    def test_hybrid_decodes(self, img):
        lut = default_quant_lut(50)
        enc = G.encode_quantize_golden(img, lut, rounding="rne",
                                       legacy_range=False)
        _agree(PK.decode_quantize(enc, lut, 128, 256, interpret=True,
                                  precision="f32"),
               G.decode_quantize_golden(enc, lut, 128, 256))
        encs = G.encode_quantize_stereo_golden(img, lut)
        _agree(PK.decode_quantize_stereo(encs, lut, 128, 256,
                                         interpret=True, precision="f32"),
               G.decode_quantize_stereo_golden(encs, lut, 128, 256))


class TestFusedPairLayout:
    """Round-2 fused in-kernel SIMD pair-cell assembly (W >= 512 routes
    encode_quantize's pair layouts through _encq_pair_panels)."""

    @pytest.fixture(scope="class")
    def wide(self):
        rng = np.random.default_rng(0xFA12)
        return rng.integers(0, 256, (256, 512), dtype=np.uint8)

    @pytest.mark.parametrize("layout", ["pair", "scalar"])
    @pytest.mark.parametrize("rounding", ["rne", "scalar", "clamp_first"])
    def test_pair_fused(self, wide, rounding, layout):
        lut = default_quant_lut(50)
        got = PK.encode_quantize(jnp.asarray(wide), lut, rounding=rounding,
                                 layout=layout, interpret=True,
                                 precision="f32")
        _agree(got, G.encode_quantize_golden(wide, lut, rounding=rounding,
                                             layout=layout,
                                             legacy_range=False))

    def test_pair_as_written_fused(self, wide):
        lut = default_quant_lut(50)
        got = PK.encode_quantize(jnp.asarray(wide), lut,
                                 layout="pair_as_written", interpret=True,
                                 precision="f32")
        _agree(got, G.encode_quantize_golden(
            wide, lut, rounding="rne", layout="pair",
            emulate_overlap_bug=True))

    def test_pair_fused_strip_range(self, wide):
        lut = default_quant_lut(50)
        got = PK.encode_quantize(jnp.asarray(wide), lut, 32, 63,
                                 layout="pair", interpret=True,
                                 precision="f32")
        _agree(got, G.encode_quantize_golden(wide, lut, 32, 63,
                                             rounding="rne", layout="pair",
                                             legacy_range=False))

    @pytest.mark.parametrize("layout", ["pair", "scalar"])
    def test_pair_fused_decode(self, wide, layout):
        """W >= 512 routes decode_quantize through _decq_pair_panels (the
        fully in-kernel inverse of the fused pair encode)."""
        lut = default_quant_lut(50)
        enc = G.encode_quantize_golden(wide, lut, rounding="rne",
                                       layout=layout, legacy_range=False)
        _agree(PK.decode_quantize(enc, lut, 512, 256, layout=layout,
                                  interpret=True, precision="f32"),
               G.decode_quantize_golden(enc, lut, 512, 256, layout=layout))

    def test_pair_fused_decode_roundtrip_psnr(self, wide):
        """Fused encode -> fused decode round-trip preserves image PSNR
        vs the golden round-trip."""
        lut = default_quant_lut(50)
        enc = PK.encode_quantize(jnp.asarray(wide), lut, layout="pair",
                                 interpret=True, precision="f32")
        dec = np.asarray(PK.decode_quantize(np.asarray(enc), lut, 512, 256,
                                            layout="pair", interpret=True,
                                            precision="f32"))
        ref = wide[:128].astype(float)

        def psnr(x):
            mse = ((ref - x.astype(float)) ** 2).mean()
            return 10 * np.log10(255 ** 2 / mse)

        gold = np.asarray(G.decode_quantize_golden(
            G.encode_quantize_golden(wide, lut, rounding="rne",
                                     layout="pair", legacy_range=False),
            lut, 512, 256, layout="pair"))
        assert abs(psnr(dec) - psnr(gold)) < 0.3

    def test_pair_fused_nondivisible_group(self):
        """W = 768 -> 6 chunks -> groups (0,), (2, overlap 2): the final
        overlapping group must reproduce chunks 4-5 exactly."""
        rng = np.random.default_rng(0xFA13)
        img = rng.integers(0, 256, (256, 768), dtype=np.uint8)
        lut = default_quant_lut(50)
        for layout in ("pair", "scalar"):
            got = PK.encode_quantize(jnp.asarray(img), lut, layout=layout,
                                     interpret=True, precision="f32")
            _agree(got, G.encode_quantize_golden(img, lut, rounding="rne",
                                                 layout=layout,
                                                 legacy_range=False))
