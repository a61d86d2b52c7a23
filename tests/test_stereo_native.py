"""TPU-native stereo record format (round-5 VERDICT #3):
``view_layout='native'`` pads every coefficient-plane row to a
128-multiple minor dim with quantized-zero bytes (127) so the record
tensor DMAs at full speed (the reference-geometry 480-byte rows run
the ~1/3-speed masked path — docs/STATUS.md "u8 DMA minor-dim lesson";
measured on-chip: dec_stereo 151 -> 89 us, experiments/
exp_r16_stereo_native.py).  Reference-parity layouts stay the compat
default (src/simd_dct.cpp:258-264 is the plane format being
re-designed here)."""

import numpy as np
import pytest

from simd_dct_tpu import api, container
from simd_dct_tpu.core import default_quant_lut

TIERS = (dict(backend="numpy"), dict(backend="xla"),
         dict(backend="pallas", pallas_interpret=True))


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0xA71E)
    return rng.integers(0, 256, (256, 128), dtype=np.uint8)


@pytest.fixture(scope="module")
def lut():
    return default_quant_lut(60)


def _bwp(w):
    return api._stereo_native_bwp(w)


def test_native_is_planar_plus_pad_per_tier(img, lut):
    """Per tier: the native tensor's data columns must equal the planar
    tensor byte-for-byte and its pad columns must be exactly 127."""
    h, w = img.shape
    s, bw, bwp = h // 16, w // 8, _bwp(w)
    for kw in TIERS:
        nat = np.asarray(api.encode_quantize_stereo(
            img, lut, view_layout="native", **kw))
        pla = np.asarray(api.encode_quantize_stereo(
            img, lut, view_layout="planar", **kw))
        assert nat.shape == (2, 64, s, bwp), kw
        np.testing.assert_array_equal(nat[..., :bw], pla, err_msg=str(kw))
        assert (nat[..., bw:] == 127).all(), kw


def test_native_cross_tier_parity(img, lut):
    """The xla fallback's native tensor equals the interpret-pallas
    kernel's within the bf16 +-1 contract on data columns and exactly
    on pad columns."""
    h, w = img.shape
    bw = w // 8
    nat_p = np.asarray(api.encode_quantize_stereo(
        img, lut, view_layout="native", backend="pallas",
        pallas_interpret=True)).astype(np.int16)
    nat_x = np.asarray(api.encode_quantize_stereo(
        img, lut, view_layout="native", backend="xla")).astype(np.int16)
    assert np.abs(nat_p[..., :bw] - nat_x[..., :bw]).max() <= 1
    np.testing.assert_array_equal(nat_p[..., bw:], nat_x[..., bw:])


def test_native_decode_equals_planar_decode(img, lut):
    h, w = img.shape
    for kw in (dict(backend="xla"),
               dict(backend="pallas", pallas_interpret=True)):
        nat = api.encode_quantize_stereo(img, lut, view_layout="native",
                                         **kw)
        pla = api.encode_quantize_stereo(img, lut, view_layout="planar",
                                         **kw)
        dn = np.asarray(api.decode_quantize_stereo(
            nat, lut, w, h, view_layout="native", **kw))
        dp = np.asarray(api.decode_quantize_stereo(
            pla, lut, w, h, view_layout="planar", **kw))
        np.testing.assert_array_equal(dn, dp, err_msg=str(kw))
        assert dn.shape == (h, w)


def test_native_oracle_parity_via_compat(img, lut):
    """compat=True native must be the byte-exact oracle stream's planar
    transpose plus the 127 pad (the golden/native oracle defines the
    data bytes; the pad is format-defined)."""
    h, w = img.shape
    s, bw = h // 16, w // 8
    nat = np.asarray(api.encode_quantize_stereo(
        img, lut, view_layout="native", compat=True, backend="xla"))
    oracle = np.asarray(api.encode_quantize_stereo(
        img, lut, compat=True, backend="numpy"))
    want = oracle.reshape(64, s, 2, bw).transpose(2, 0, 1, 3)
    np.testing.assert_array_equal(nat[..., :bw], want)
    assert (nat[..., bw:] == 127).all()


def test_native_unaligned_width(lut):
    """W % 128 != 0 (pad-and-slice path): the zero-padded pixel columns
    encode to exactly 127, so every column >= W/8 is pad by the format
    definition, on every tier."""
    rng = np.random.default_rng(7)
    h, w = 64, 136                      # wp=256, bw=17, bwp=128
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    bw, bwp = w // 8, _bwp(w)
    assert bwp == 128
    for kw in TIERS:
        nat = np.asarray(api.encode_quantize_stereo(
            img, lut, view_layout="native", **kw))
        assert nat.shape == (2, 64, h // 16, bwp), kw
        assert (nat[..., bw:] == 127).all(), kw
        dec = np.asarray(api.decode_quantize_stereo(
            nat, lut, w, h, view_layout="native", **kw))
        want = np.asarray(api.decode_quantize_stereo(
            api.encode_quantize_stereo(img, lut, **kw), lut, w, h, **kw))
        np.testing.assert_array_equal(dec, want, err_msg=str(kw))


def test_native_strip_range_zeroes_whole_rows(img, lut):
    """Excluded strips are fully zeroed — data AND pad columns — on
    every tier (the same strip semantics as the other layouts)."""
    h, w = img.shape
    start_y, end_y = 64, 127
    s_idx = np.arange(h // 16)
    included = (s_idx * 16 >= start_y) & (s_idx * 16 <= end_y)
    ref = None
    for kw in TIERS:
        nat = np.asarray(api.encode_quantize_stereo(
            img, lut, start_y, end_y, view_layout="native", **kw))
        assert (nat[:, :, ~included, :] == 0).all(), kw
        assert (nat[:, :, included, w // 8:] == 127).all(), kw
        if ref is None:
            ref = nat
        else:   # bf16 contract on data cols, exact elsewhere
            assert np.abs(nat.astype(np.int16)
                          - ref.astype(np.int16)).max() <= 1, kw


def test_native_validation(img, lut):
    h, w = img.shape
    with pytest.raises(api.InvalidParameterError):
        api.encode_quantize_stereo(img, lut, view_layout="navite")
    nat = api.encode_quantize_stereo(img, lut, view_layout="native",
                                     backend="xla")
    # planar-shaped tensor rejected by the native decode
    with pytest.raises(api.InvalidParameterError):
        api.decode_quantize_stereo(
            np.asarray(nat)[..., : w // 8], lut, w, h,
            view_layout="native")
    with pytest.raises(api.InvalidParameterError):
        api.decode_quantize_stereo(
            np.asarray(nat).astype(np.int16), lut, w, h,
            view_layout="native", backend="pallas", pallas_interpret=True)


def test_container_stereo_native_roundtrip(img, lut):
    h, w = img.shape
    for sparse in (False, True):
        blob = container.encode(img, "enc-quant-stereo", quality=60.0,
                                view_layout="native", sparse=sparse,
                                backend="xla")
        meta = container.info(blob)
        assert meta.stereo_native and not meta.stereo_planar
        dec = np.asarray(container.decode(blob, backend="xla"))
        want = np.asarray(api.decode_quantize_stereo(
            api.encode_quantize_stereo(img, default_quant_lut(60.0),
                                       backend="xla"),
            default_quant_lut(60.0), w, h, backend="xla"))
        np.testing.assert_array_equal(dec, want, err_msg=f"sparse={sparse}")


def test_container_video_stereo_native(img, lut):
    frames = np.stack([img, np.roll(img, 5, axis=1)])
    blob = container.encode_video(frames, "enc-quant-stereo",
                                  quality=60.0, view_layout="native",
                                  backend="xla")
    m = container.video_info(blob)
    assert m.stereo_native and not m.stereo_planar
    batch = np.asarray(container.decode_video(blob, backend="xla"))
    one = np.asarray(container.decode_video_frame(blob, 1, backend="xla"))
    np.testing.assert_array_equal(batch[1], one)


def test_native_layout_rejected_for_other_modes(img):
    with pytest.raises(container.ContainerError):
        container.encode(img, "enc-quant32", view_layout="native")
    meta_kwargs = dict(mode="enc-quant32", size_x=img.shape[1],
                       size_y=img.shape[0],
                       luma_lut=np.ones(64, np.float32))
    with pytest.raises(container.ContainerError):
        container.pack(np.zeros(img.size, np.uint8),
                       container.FrameMeta(stereo_native=True,
                                           **meta_kwargs))
    with pytest.raises(container.ContainerError):
        container.pack(np.zeros(img.size, np.uint8),
                       container.FrameMeta(mode="enc-quant-stereo",
                                           size_x=img.shape[1],
                                           size_y=img.shape[0],
                                           luma_lut=np.ones(64, np.float32),
                                           stereo_planar=True,
                                           stereo_native=True))


def test_encoder_facade_stereo_layout(img, lut):
    import simd_dct_tpu as sd
    enc = sd.Encoder(sd.EncoderConfig(quality=60, stereo_layout="native",
                                      backend="xla"))
    h, w = img.shape
    nat = np.asarray(enc.encode_quantize_stereo(img))
    assert nat.shape == (2, 64, h // 16, api._stereo_native_bwp(w))
    dec = np.asarray(enc.decode_quantize_stereo(nat, w, h))
    assert dec.shape == (h, w)
    blob = enc.encode_container(img, "enc-quant-stereo")
    assert container.info(blob).stereo_native
    np.testing.assert_array_equal(np.asarray(enc.decode_container(blob)),
                                  dec)
    with pytest.raises(ValueError):
        sd.EncoderConfig(stereo_layout="nativ")


def test_native_with_spill(lut):
    """spill=True (H % 16 == 8) composes with the native layout: the
    synthetic dual-view geometry encodes like any other, per tier."""
    rng = np.random.default_rng(21)
    h, w = 72, 128                      # H2 = 36 -> spilled to 40 rows
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    outs = []
    for kw in TIERS:
        nat = np.asarray(api.encode_quantize_stereo(
            img, lut, spill=True, view_layout="native", **kw))
        assert nat.shape[0:2] == (2, 64) and nat.shape[-1] == _bwp(w), kw
        assert (nat[..., w // 8:] == 127).all(), kw
        outs.append(nat.astype(np.int16))
    assert np.abs(outs[0] - outs[2]).max() <= 1   # cross-tier contract
