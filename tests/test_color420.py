"""YCbCr 4:2:0 chroma-subsampled pipeline (kernels/color420.py + api).

The fused kernels fold the 2x2 chroma downsample/upsample into the DCT
basis matrices; agreement with the XLA composition (explicit mean-pool /
replication) is to +-1 byte at rounding boundaries, the same contract as
the 4:4:4 color tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simd_dct_tpu import api
from simd_dct_tpu.kernels import color420 as C
from simd_dct_tpu.layout.color import BASE_CHROMA_QUANT_TABLE
from simd_dct_tpu.core.quantize import default_quant_lut

H, W = 64, 512        # dual-view: top view (32, 512)
H2 = H // 2


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (np.sin(xx / 19.0) * np.cos(yy / 13.0) * 0.5 + 0.5) * 200 + 20
    # correlated channels (scaled copies): decorrelated channels cap
    # PSNR ~34 dB regardless of correctness
    planes = np.stack([
        np.clip(base * s + rng.normal(0, 4, (H, W)), 0, 255)
        for s in (1.0, 0.82, 0.9)])
    return planes.astype(np.uint8)


@pytest.fixture(scope="module")
def luts():
    return (jnp.asarray(default_quant_lut(100) * 255.0),
            jnp.asarray(BASE_CHROMA_QUANT_TABLE * 100 * 255.0))


def _agree(a, b, tol_frac=0.02, max_abs=2):
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    d = np.abs(a - b)
    assert d.max() <= max_abs, d.max()
    assert (d > 0).mean() <= tol_frac, (d > 0).mean()


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64)
                   - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


class TestFused420:
    def test_encode_matches_composition(self, rgb, luts):
        luma, chroma = luts
        top = jnp.asarray(rgb[:, :H2, :])
        y_x, c_x = C.encode_ycbcr420_xla(top, luma, chroma)
        y_k, c_k = C._enc420_panels(top, luma, chroma, interpret=True,
                                    precision="f32")
        assert y_k.shape == (H2 // 8, 8 * W)
        assert c_k.shape == (2, H2 // 16, 4 * W)
        _agree(y_k, y_x, max_abs=1)
        _agree(c_k, c_x, max_abs=1)

    def test_decode_matches_composition(self, rgb, luts):
        luma, chroma = luts
        top = jnp.asarray(rgb[:, :H2, :])
        y_x, c_x = C.encode_ycbcr420_xla(top, luma, chroma)
        rgb_x = C.decode_ycbcr420_xla(y_x, c_x, luma, chroma)
        rgb_k = C._dec420_panels(y_x, c_x, luma, chroma, interpret=True,
                                 precision="f32")
        assert rgb_k.shape == (3, H2, W)
        _agree(rgb_k, rgb_x, max_abs=2)

    def test_roundtrip_psnr(self, rgb, luts):
        luma, chroma = luts
        top = jnp.asarray(rgb[:, :H2, :])
        y_k, c_k = C._enc420_panels(top, luma, chroma, interpret=True,
                                    precision="f32")
        out = C._dec420_panels(y_k, c_k, luma, chroma, interpret=True,
                               precision="f32")
        p420 = _psnr(out, rgb[:, :H2, :])
        assert p420 > 30.0, p420
        # 4:2:0 loses chroma detail but must stay within a few dB of
        # the 4:4:4 pipeline on smooth correlated content
        from simd_dct_tpu.kernels import color32 as C444
        rec = C444.encode_ycbcr_xla(top, luma, chroma)
        p444 = _psnr(C444.decode_ycbcr_xla(rec, luma, chroma),
                     rgb[:, :H2, :])
        assert p420 > p444 - 5.0, (p420, p444)

    def test_y_segment_is_mode32_luma(self, rgb, luts):
        """The Y segment must be the standard mode32 record stream of
        the luma plane (= channel 0 of the 4:4:4 ycbcr encode)."""
        luma, chroma = luts
        top = jnp.asarray(rgb[:, :H2, :])
        from simd_dct_tpu.kernels import color32 as C444
        rec444 = C444.encode_ycbcr_xla(top, luma, chroma)
        y_x, _ = C.encode_ycbcr420_xla(top, luma, chroma)
        _agree(y_x, rec444[0].reshape(H2 // 8, 8 * W), max_abs=1,
               tol_frac=0.0)

    def test_bf16_close_to_f32(self, rgb, luts):
        luma, chroma = luts
        top = jnp.asarray(rgb[:, :H2, :])
        y_f, c_f = C._enc420_panels(top, luma, chroma, interpret=True,
                                    precision="f32")
        y_b, c_b = C._enc420_panels(top, luma, chroma, interpret=True,
                                    precision="bf16")
        _agree(y_b, y_f, tol_frac=0.05, max_abs=1)
        _agree(c_b, c_f, tol_frac=0.05, max_abs=1)

    def test_unaligned_w_pad_and_slice(self, luts):
        """W % 256 != 0 (but % 128 == 0) takes the fused path via
        pad-and-slice; must match the XLA tier on the same image."""
        luma, chroma = luts
        rng = np.random.default_rng(3)
        w = 384
        yy, xx = np.mgrid[0:32, 0:w]
        base = (np.sin(xx / 11.0) * np.cos(yy / 7.0) * 0.5 + 0.5) * 180 + 30
        top = jnp.asarray(np.stack([
            np.clip(base * s + rng.normal(0, 3, (32, w)), 0, 255)
            for s in (1.0, 0.8, 0.95)]).astype(np.uint8))
        y_x, c_x = C.encode_ycbcr420_xla(top, luma, chroma)
        y_k, c_k = C.enc420_rgb(top, luma, chroma, interpret=True,
                                precision="f32")
        assert y_k.shape == y_x.shape and c_k.shape == c_x.shape
        _agree(y_k, y_x, max_abs=1)
        _agree(c_k, c_x, max_abs=1)
        out_k = C.dec420_rgb(y_k, c_k, luma, chroma, interpret=True,
                             precision="f32")
        out_x = C.decode_ycbcr420_xla(y_x, c_x, luma, chroma)
        _agree(out_k, out_x, max_abs=2)


class TestApi420:
    def test_api_roundtrip_xla(self, rgb, luts):
        luma, chroma = luts
        flat = api.encode_quantize32_ycbcr420(rgb, luma, chroma,
                                              backend="xla")
        assert flat.shape == ((3 * H2 * W) // 2,)
        out = api.decode_quantize32_ycbcr420(flat, luma, chroma, W, H,
                                             backend="xla")
        assert out.shape == (3, H2, W)
        assert _psnr(out, rgb[:, :H2, :]) > 30.0

    def test_api_tiers_agree(self, rgb, luts):
        luma, chroma = luts
        a = api.encode_quantize32_ycbcr420(rgb, luma, chroma,
                                           backend="xla")
        b = api.encode_quantize32_ycbcr420(rgb, luma, chroma,
                                           backend="pallas",
                                           pallas_interpret=True)
        _agree(b, a, max_abs=1)
        da = api.decode_quantize32_ycbcr420(a, luma, chroma, W, H,
                                            backend="xla")
        db = api.decode_quantize32_ycbcr420(a, luma, chroma, W, H,
                                            backend="pallas",
                                            pallas_interpret=True)
        # the pallas tier decodes in bf16: bytes differ by <=2 on up to
        # ~half the pixels (rint ties on half-integer dequant values);
        # the quality contract is PSNR parity with the f32 XLA tier
        d = np.abs(np.asarray(da, np.int32) - np.asarray(db, np.int32))
        assert d.max() <= 2, d.max()
        top = rgb[:, :H2, :]
        assert abs(_psnr(da, top) - _psnr(db, top)) < 0.3

    def test_api_batched(self, rgb, luts):
        luma, chroma = luts
        batch = jnp.asarray(np.stack([rgb, rgb[:, ::-1, :].copy()]))
        flat = api.encode_quantize32_ycbcr420(batch, luma, chroma,
                                              backend="xla")
        assert flat.shape == (2, (3 * H2 * W) // 2)
        one = api.encode_quantize32_ycbcr420(rgb, luma, chroma,
                                             backend="xla")
        np.testing.assert_array_equal(np.asarray(flat[0]), np.asarray(one))
        out = api.decode_quantize32_ycbcr420(flat.reshape(-1), luma,
                                             chroma, W, H, backend="xla")
        assert out.shape == (2, 3, H2, W)

    def test_container_roundtrip(self, rgb, luts):
        from simd_dct_tpu import container as C
        blob = C.encode(np.asarray(rgb), "enc-quant32-ycbcr420",
                        quality=100.0, compress=True, backend="xla")
        m = C.info(blob)
        assert m.mode == "enc-quant32-ycbcr420"
        assert m.chroma_lut is not None
        out = C.decode(blob, backend="xla")
        assert out.shape == (3, H2, W)
        assert _psnr(out, rgb[:, :H2, :]) > 30.0
        # 420 container is ~25% smaller than 444 on the same frame
        blob444 = C.encode(np.asarray(rgb), "enc-quant32-ycbcr",
                           quality=100.0, compress=True, backend="xla")
        assert blob.size < blob444.size

    def test_container_video_roundtrip(self, rgb, luts):
        from simd_dct_tpu import container as C
        frames = np.stack([np.asarray(rgb),
                           np.asarray(rgb)[:, ::-1, :].copy()])
        blob = C.encode_video(frames, "enc-quant32-ycbcr420",
                              quality=100.0, backend="xla")
        out = C.decode_video(blob, backend="xla")
        assert out.shape == (2, 3, H2, W)
        one = C.decode_video_frame(blob, 1, backend="xla")
        np.testing.assert_array_equal(np.asarray(one), np.asarray(out[1]))

    def test_api_validation(self, rgb, luts):
        luma, chroma = luts
        with pytest.raises(api.NotSupportedError):
            api.encode_quantize32_ycbcr420(rgb[:, :, : W - 64], luma,
                                           chroma)   # W % 128 != 0
        with pytest.raises(api.NotSupportedError):
            api.encode_quantize32_ycbcr420(rgb[:, : H - 16, :], luma,
                                           chroma)   # H % 32 != 0
        with pytest.raises(api.InvalidParameterError):
            api.decode_quantize32_ycbcr420(
                jnp.zeros(100, jnp.uint8), luma, chroma, W, H)
        with pytest.raises(api.NotSupportedError):
            api.encode_quantize32_ycbcr420(rgb, luma, chroma,
                                           backend="numpy")
