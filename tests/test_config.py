"""EncoderConfig / Encoder facade tests."""

import numpy as np
import pytest

import simd_dct_tpu as sd


def test_config_validation():
    with pytest.raises(ValueError):
        sd.EncoderConfig(rounding="nearest")
    with pytest.raises(ValueError):
        sd.EncoderConfig(layout="planar")
    with pytest.raises(ValueError):
        sd.EncoderConfig(backend="cuda")
    cfg = sd.EncoderConfig(quality=50)
    np.testing.assert_allclose(cfg.lut(), sd.default_quant_lut(50))


def test_encoder_facade_roundtrip():
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:32, 0:64]
    img = np.clip(128 + 40 * np.sin(xx / 9) * np.cos(yy / 7), 0,
                  255).astype(np.uint8)
    enc = sd.Encoder(sd.EncoderConfig(quality=100))
    rec = np.asarray(enc.encode_quantize32(img))
    # the facade matches the raw api with the 255x mode32 LUT convention
    want = np.asarray(sd.encode_quantize32(img, sd.default_quant_lut(100) * 255.0))
    np.testing.assert_array_equal(rec, want)
    out = np.asarray(enc.decode_quantize32(rec, 64, 32))
    mse = ((img[:16].astype(float) - out.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30
    # strip-range config flows through
    enc2 = sd.Encoder(sd.EncoderConfig(quality=100, start_y=16, end_y=31))
    rec2 = np.asarray(enc2.encode_quantize32(img))
    assert np.all(rec2[: 8 * 64] == 0) and np.any(rec2[8 * 64:] != 0)


def test_encoder_all_modes():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    enc = sd.Encoder(sd.EncoderConfig(quality=50, layout="pair"))
    e1 = np.asarray(enc.encode_quantize(img))
    d1 = np.asarray(enc.decode_quantize(e1, 64, 32))
    assert d1.shape == (16, 64)
    e3 = np.asarray(enc.encode_quantize_stereo(img))
    d3 = np.asarray(enc.decode_quantize_stereo(e3, 64, 32))
    assert d3.shape == (32, 64)
    rt = np.asarray(enc.roundtrip_quantize32(img))
    assert rt.shape == (16, 64)


def test_encoder_ycbcr_and_compat_decode():
    import numpy as np
    from simd_dct_tpu.config import Encoder, EncoderConfig
    rng = np.random.default_rng(11)
    enc = Encoder(EncoderConfig(quality=100))
    planes = rng.integers(0, 256, (3, 64, 128), np.uint8)
    rec = enc.encode_quantize32_ycbcr(planes)
    out = enc.decode_quantize32_ycbcr(rec, 128, 64)
    assert np.asarray(out).shape == (3, 32, 128)
    rt = enc.roundtrip_quantize32_ycbcr(planes)
    assert np.asarray(rt).shape == (3, 32, 128)
    # compat decode routes byte-exactly vs the oracle
    from simd_dct_tpu import native
    img = rng.integers(0, 256, (64, 128), np.uint8)
    cenc = Encoder(EncoderConfig(quality=50, compat=True))
    rec2 = np.asarray(cenc.encode_quantize(img))
    want = native.decode_quantize(rec2, cenc.lut, 128, 64)
    got = np.asarray(cenc.decode_quantize(rec2, 128, 64))
    assert int((got != want).sum()) == 0


def test_encoder_compressed_pipeline():
    """Facade entropy methods: compress -> decompress -> decode equals
    the uncompressed decode exactly."""
    import numpy as np
    import simd_dct_tpu as sd
    yy, xx = np.mgrid[0:64, 0:128]
    img = np.clip(128 + 50 * np.sin(xx / 9) * np.cos(yy / 5),
                  0, 255).astype(np.uint8)
    enc = sd.Encoder(sd.EncoderConfig(quality=100))
    blob = enc.encode_quantize32_compressed(img)
    dec = enc.decode_quantize32_compressed(blob, 128, 64)
    ref = enc.decode_quantize32(np.asarray(enc.encode_quantize32(img)),
                                128, 64)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref))
    assert blob.size < 64 * 128 // 2  # smooth content compresses >2x
    # sparse=True is semantically invisible (round-4 wiring)
    blob_s = enc.encode_quantize32_compressed(img, sparse=True)
    dec_s = enc.decode_quantize32_compressed(blob_s, 128, 64)
    np.testing.assert_array_equal(np.asarray(dec_s), np.asarray(ref))


def test_encoder_container_roundtrip():
    """Encoder facade container methods: config quality/rounding travel
    in the header and decode without the config."""
    import numpy as np
    import simd_dct_tpu as sd

    yy, xx = np.mgrid[0:64, 0:128]
    img = np.clip(128 + 50 * np.sin(xx / 9), 0, 255).astype(np.uint8)
    enc = sd.Encoder(sd.EncoderConfig(quality=50.0))
    blob = enc.encode_container(img)
    ref = np.asarray(enc.decode_quantize32(
        np.asarray(enc.encode_quantize32(img)), 128, 64))
    np.testing.assert_array_equal(np.asarray(enc.decode_container(blob)),
                                  ref)
    # a DIFFERENT config still decodes it identically (self-describing)
    other = sd.Encoder(sd.EncoderConfig(quality=2.0))
    np.testing.assert_array_equal(np.asarray(other.decode_container(blob)),
                                  ref)


def test_encoder_video_container_roundtrip():
    import numpy as np
    import simd_dct_tpu as sd

    rngimg = [np.clip(128 + 50 * np.sin((np.mgrid[0:64, 0:128][1] + p) / 9),
                      0, 255).astype(np.uint8) for p in (0, 5)]
    frames = np.stack(rngimg)
    enc = sd.Encoder(sd.EncoderConfig(quality=50.0))
    blob = enc.encode_video_container(frames)
    got = np.asarray(enc.decode_video_container(blob))
    for i in range(2):
        ref = np.asarray(enc.decode_quantize32(
            np.asarray(enc.encode_quantize32(frames[i])), 128, 64))
        np.testing.assert_array_equal(got[i], ref)
