"""Fused YCbCr mode32 kernels (kernels/color32.py) vs the unfused
composition (XLA YCbCr mix + per-channel mode32 tier).

The fused path skips the u8 YCbCr intermediate, so agreement with a
float-precision reference is to +-1 byte at rounding boundaries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simd_dct_tpu.kernels import color32 as C
from simd_dct_tpu.kernels import xla_path as X
from simd_dct_tpu.layout.color import (_RGB2YCC, _YCC2RGB,
                                       BASE_CHROMA_QUANT_TABLE)
from simd_dct_tpu.core.quantize import default_quant_lut

H, W = 256, 256       # dual-view: top view (128, 256) is one panel


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (np.sin(xx / 19.0) * np.cos(yy / 13.0) * 0.5 + 0.5) * 200 + 20
    planes = np.stack([
        np.clip(base + rng.normal(0, 8, (H, W)), 0, 255) for _ in range(3)])
    return planes.astype(np.uint8)


@pytest.fixture(scope="module")
def luts():
    return (jnp.asarray(default_quant_lut(100) * 255.0),
            jnp.asarray(BASE_CHROMA_QUANT_TABLE * 100 * 255.0))


def _ycc_f32(planes):
    """Float YCbCr planes of the TOP view (no u8 intermediate)."""
    x = planes[:, : H // 2, :].astype(np.float32)
    ycc = np.einsum("ij,jhw->ihw", _RGB2YCC, x)
    return ycc + np.array([0.0, 128.0, 128.0], np.float32)[:, None, None]


def _agree(a, b, tol_frac=0.01, max_abs=2):
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    d = np.abs(a - b)
    assert d.max() <= max_abs, d.max()
    assert (d > 0).mean() <= tol_frac, (d > 0).mean()


class TestFusedColorEncode:
    def test_encode_matches_composition(self, rgb, luts):
        luma, chroma = luts
        rec = np.asarray(C.encode_quantize32_ycbcr(
            jnp.asarray(rgb), luma, chroma, interpret=True,
            precision="f32")).reshape(3, -1)
        ycc = _ycc_f32(rgb)
        for ch, lut in ((0, luma), (1, chroma), (2, chroma)):
            # XLA tier on the rounded-u8 plane; fused kernel on the f32
            # mix — identical up to the rounding-boundary contract
            pln = np.clip(np.rint(ycc[ch]), 0, 255).astype(np.uint8)
            dual = np.concatenate([pln, pln], axis=0)      # dual-view pad
            ref = np.asarray(X.encode_quantize32(
                jnp.asarray(dual), lut, 0, 1 << 30, "rne"))
            _agree(rec[ch], ref, tol_frac=0.06, max_abs=3)

    def test_decode_inverts_encode(self, rgb, luts):
        luma, chroma = luts
        rec = C.encode_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                        interpret=True, precision="f32")
        out = np.asarray(C.decode_quantize32_ycbcr(
            rec, luma, chroma, W, H, interpret=True, precision="f32"))
        top = rgb[:, : H // 2, :].astype(np.float32)
        mse = ((out.astype(np.float32) - top) ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / mse)
        assert psnr > 30.0, psnr

    def test_roundtrip_matches_enc_dec(self, rgb, luts):
        luma, chroma = luts
        rec = C.encode_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                        interpret=True, precision="f32")
        dec = C.decode_quantize32_ycbcr(rec, luma, chroma, W, H,
                                        interpret=True, precision="f32")
        rt = C.roundtrip_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                          interpret=True, precision="f32")
        _agree(rt, dec, tol_frac=0.01, max_abs=1)

    def test_bf16_close_to_f32(self, rgb, luts):
        luma, chroma = luts
        a = C.encode_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                      interpret=True, precision="f32")
        b = C.encode_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                      interpret=True, precision="bf16")
        _agree(a, b, tol_frac=0.05, max_abs=1)


class TestColorApi:
    def test_api_roundtrip_tiers_agree(self, rgb, luts):
        import simd_dct_tpu as sd
        luma, chroma = luts
        out_x = np.asarray(sd.api.roundtrip_quantize32_ycbcr(
            jnp.asarray(rgb), luma, chroma, backend="xla"))
        out_p = np.asarray(sd.api.roundtrip_quantize32_ycbcr(
            jnp.asarray(rgb), luma, chroma, backend="pallas",
            pallas_interpret=True))
        # a +-1 quantized-coefficient flip amplifies by the quant step
        # through the inverse, so tier agreement on round-trip OUTPUT is
        # a PSNR contract (like the grayscale fused round-trip test)
        top = rgb[:, : H // 2, :].astype(np.float32)

        def psnr(x):
            mse = ((x.astype(np.float32) - top) ** 2).mean()
            return 10 * np.log10(255.0 ** 2 / mse)

        assert psnr(out_x) > 30.0
        assert abs(psnr(out_x) - psnr(out_p)) < 0.3

    def test_api_encode_decode(self, rgb, luts):
        import simd_dct_tpu as sd
        luma, chroma = luts
        rec = sd.api.encode_quantize32_ycbcr(jnp.asarray(rgb), luma, chroma,
                                             backend="xla")
        assert rec.shape == (3, (H // 2) * W)
        out = sd.api.decode_quantize32_ycbcr(rec, luma, chroma, W, H,
                                             backend="xla")
        assert out.shape == (3, H // 2, W)

    def test_api_validation(self, rgb, luts):
        import simd_dct_tpu as sd
        from simd_dct_tpu.api import InvalidParameterError
        luma, chroma = luts
        with pytest.raises(InvalidParameterError):
            sd.api.encode_quantize32_ycbcr(jnp.asarray(rgb[0]), luma, chroma)
        with pytest.raises(InvalidParameterError):
            sd.api.decode_quantize32_ycbcr(np.zeros(17, np.uint8), luma,
                                           chroma, W, H)

    def test_api_unaligned_geometry(self, luts):
        """Round 2: unaligned color geometries reach the fused RGB
        kernels through the pad-and-slice wrappers."""
        import simd_dct_tpu as sd
        luma, chroma = luts
        h, w = 48, 192          # h2=24 (3 strips), W not chunk-aligned
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        kw = dict(backend="pallas", pallas_interpret=True)
        rec = sd.api.encode_quantize32_ycbcr(rgb, luma, chroma, **kw)
        ref = sd.api.encode_quantize32_ycbcr(rgb, luma, chroma,
                                             backend="xla")
        diff = np.abs(np.asarray(rec).astype(np.int16)
                      - np.asarray(ref).astype(np.int16))
        assert diff.max(initial=0) <= 1
        assert np.count_nonzero(diff) <= max(4, diff.size * 0.03)
        dec = sd.api.decode_quantize32_ycbcr(rec, luma, chroma, w, h, **kw)
        assert dec.shape == (3, h // 2, w)
        rt = sd.api.roundtrip_quantize32_ycbcr(rgb, luma, chroma, **kw)
        ddiff = np.abs(np.asarray(dec).astype(np.int16)
                       - np.asarray(rt).astype(np.int16))
        assert ddiff.max(initial=0) <= 2

    def test_api_batched_forms(self, rgb, luts):
        import simd_dct_tpu as sd
        luma, chroma = luts
        batch = jnp.stack([jnp.asarray(rgb)] * 2)
        rec_b = sd.api.encode_quantize32_ycbcr(batch, luma, chroma,
                                               backend="xla")
        assert rec_b.shape == (2, 3, (H // 2) * W)
        rec_1 = sd.api.encode_quantize32_ycbcr(jnp.asarray(rgb), luma,
                                               chroma, backend="xla")
        np.testing.assert_array_equal(np.asarray(rec_b[0]),
                                      np.asarray(rec_1))
        dec_b = sd.api.decode_quantize32_ycbcr(rec_b, luma, chroma, W, H,
                                               backend="xla")
        assert dec_b.shape == (2, 3, H // 2, W)
        rt_b = sd.api.roundtrip_quantize32_ycbcr(batch, luma, chroma,
                                                 backend="xla")
        assert rt_b.shape == (2, 3, H // 2, W)
        np.testing.assert_array_equal(np.asarray(dec_b[0]),
                                      np.asarray(dec_b[1]))

    def test_api_batch_of_one_keeps_axis(self, rgb, luts):
        """A (1,3,H,W) batch stays batched through decode — shape
        symmetry with the batched encode/roundtrip."""
        import simd_dct_tpu as sd
        luma, chroma = luts
        batch1 = jnp.stack([jnp.asarray(rgb)])
        rec = sd.api.encode_quantize32_ycbcr(batch1, luma, chroma,
                                             backend="xla")
        assert rec.shape == (1, 3, (H // 2) * W)
        dec = sd.api.decode_quantize32_ycbcr(rec, luma, chroma, W, H,
                                             backend="xla")
        assert dec.shape == (1, 3, H // 2, W)
        rt = sd.api.roundtrip_quantize32_ycbcr(batch1, luma, chroma,
                                               backend="xla")
        assert rt.shape == dec.shape

    def test_api_degenerate_dims_rejected(self, luts):
        import simd_dct_tpu as sd
        from simd_dct_tpu.api import (InvalidParameterError,
                                      NotSupportedError)
        luma, chroma = luts
        for sx, sy in ((0, 64), (128, 0)):
            with pytest.raises(InvalidParameterError):
                sd.api.decode_quantize32_ycbcr(
                    np.zeros(10, np.uint8), luma, chroma, sx, sy)
        # geometry contract violations mirror the gray decode entries
        for sx, sy in ((128, 8), (100, 64)):
            with pytest.raises(NotSupportedError):
                sd.api.decode_quantize32_ycbcr(
                    np.zeros(10, np.uint8), luma, chroma, sx, sy)
