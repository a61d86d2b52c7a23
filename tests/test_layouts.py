"""Layout transform invertibility and cross-checks."""

import numpy as np
import jax.numpy as jnp

from simd_dct_tpu import layout as L


def test_blockize_roundtrip(rng):
    img = rng.integers(0, 256, (3, 32, 40), dtype=np.uint8)
    b = L.blockize(jnp.asarray(img))
    assert b.shape == (3, 4, 5, 8, 8)
    np.testing.assert_array_equal(np.asarray(L.unblockize(b)), img)
    # block (i, j) == image tile
    np.testing.assert_array_equal(np.asarray(b[1, 2, 3]),
                                  img[1, 16:24, 24:32])


def test_buffer_orientations(rng):
    c = rng.normal(size=(5, 8, 8)).astype(np.float32)
    for o in ("fx", "fy"):
        buf = L.coeffs_to_buffer(jnp.asarray(c), o)
        back = L.buffer_to_coeffs(buf, o)
        np.testing.assert_array_equal(np.asarray(back), c)
    np.testing.assert_array_equal(
        np.asarray(L.coeffs_to_buffer(jnp.asarray(c), "fy"))[0],
        c[0].reshape(64))
    np.testing.assert_array_equal(
        np.asarray(L.coeffs_to_buffer(jnp.asarray(c), "fx"))[0],
        c[0].T.reshape(64))


def test_reorder_inverses(rng):
    bufs = rng.integers(0, 256, (4, 16, 64), dtype=np.uint8)
    j = jnp.asarray(bufs)
    np.testing.assert_array_equal(
        np.asarray(L.block_contiguous_inverse(L.block_contiguous(j), 16)), bufs)
    np.testing.assert_array_equal(
        np.asarray(L.pair_cells_inverse(L.pair_cells(j), 16)), bufs)
    np.testing.assert_array_equal(
        np.asarray(L.group8_inverse(L.group8(j), 16)), bufs)
    stereo = rng.integers(0, 256, (2, 4, 16, 64), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(L.planar_stereo_inverse(L.planar_stereo(jnp.asarray(stereo)),
                                           4, 16)), stereo)


def test_group8_byte_positions(rng):
    """out[g*512 + p*8 + b] == coeff p of block b (src/simd_dct.cpp:2021-2025)."""
    bufs = rng.integers(0, 256, (1, 16, 64), dtype=np.uint8)
    flat = np.asarray(L.group8(jnp.asarray(bufs)))
    for g in range(2):
        for b in range(8):
            for p in (0, 17, 63):
                assert flat[g * 512 + p * 8 + b] == bufs[0, g * 8 + b, p]


def test_planar_byte_positions(rng):
    """plane p, strip s: BW left bytes then BW right bytes
    (src/simd_dct.cpp:284-294)."""
    s, bw = 3, 4
    bufs = rng.integers(0, 256, (2, s, bw, 64), dtype=np.uint8)
    flat = np.asarray(L.planar_stereo(jnp.asarray(bufs)))
    plane_size = s * 2 * bw
    for p in (0, 31, 63):
        for si in range(s):
            for v in range(2):
                for b in range(bw):
                    pos = p * plane_size + si * 2 * bw + v * bw + b
                    assert flat[pos] == bufs[v, si, b, p]


def test_zigzag(rng):
    order = L.zigzag_order()
    # canonical JPEG zigzag prefix
    np.testing.assert_array_equal(order[:10], [0, 1, 8, 16, 9, 2, 3, 10, 17, 24])
    assert sorted(order.tolist()) == list(range(64))
    bufs = rng.normal(size=(7, 64)).astype(np.float32)
    zz = L.to_zigzag(jnp.asarray(bufs))
    np.testing.assert_array_equal(np.asarray(L.from_zigzag(zz)), bufs)


def test_color_transforms(rng):
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    planar = L.rgb_to_planar(jnp.asarray(img))
    assert planar.shape == (3, 16, 16)
    np.testing.assert_array_equal(np.asarray(L.planar_to_rgb(planar)), img)
    ycc = L.rgb_to_ycbcr(jnp.asarray(img))
    back = np.asarray(L.ycbcr_to_rgb(ycc))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_stereo_views(rng):
    img = rng.integers(0, 256, (32, 16), dtype=np.uint8)
    views = L.split_views(jnp.asarray(img))
    assert views.shape == (2, 16, 16)
    np.testing.assert_array_equal(np.asarray(views[0]), img[:16])
    np.testing.assert_array_equal(np.asarray(views[1]), img[16:])
    np.testing.assert_array_equal(np.asarray(L.stack_views(views)), img)
    np.testing.assert_array_equal(np.asarray(L.top_view(jnp.asarray(img))), img[:16])
