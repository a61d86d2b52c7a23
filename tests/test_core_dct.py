"""Property tests for the core DCT math (SURVEY.md §4 test pyramid)."""

import numpy as np
import jax.numpy as jnp

from simd_dct_tpu.core import (
    dct_basis_np, strip_basis_np, dct8, idct8, dct8x8, idct8x8,
)
from simd_dct_tpu.core.dct import C_A, C_B, C_C, C_D, C_E, C_F, C_NORM


def test_basis_constants_match_reference():
    # The exact f32 constants of src/simd_dct.cpp:140-146.
    assert C_A == np.float32(np.sqrt(2) * np.cos(1 * np.pi / 16))
    assert C_B == np.float32(np.sqrt(2) * np.cos(2 * np.pi / 16))
    assert C_C == np.float32(np.sqrt(2) * np.cos(3 * np.pi / 16))
    assert C_D == np.float32(np.sqrt(2) * np.cos(5 * np.pi / 16))
    assert C_E == np.float32(np.sqrt(2) * np.cos(6 * np.pi / 16))
    assert C_F == np.float32(np.sqrt(2) * np.cos(7 * np.pi / 16))
    assert C_NORM == np.float32(1 / np.sqrt(8))


def test_basis_orthonormal():
    d = dct_basis_np("float64")
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-12)
    d32 = dct_basis_np("float32")
    np.testing.assert_allclose(d32 @ d32.T, np.eye(8), atol=1e-6)
    # f32 basis equals f64 basis to f32 precision.
    np.testing.assert_allclose(d32, d, atol=1e-7)


def test_basis_matches_butterfly():
    """D @ x must reproduce the reference butterfly inplace_dct8
    (src/simd_dct.cpp:148-171) evaluated in float64."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 8)

    # Literal transcription of the butterfly dataflow (our own code,
    # mirroring the documented math).
    a, b, c, dd, e, f = (np.sqrt(2) * np.cos(k * np.pi / 16)
                         for k in (1, 2, 3, 5, 6, 7))
    n = 1 / np.sqrt(8)
    x07p, x16p, x25p, x34p = x[0] + x[7], x[1] + x[6], x[2] + x[5], x[3] + x[4]
    x07m, x61m, x25m, x43m = x[0] - x[7], x[6] - x[1], x[2] - x[5], x[4] - x[3]
    pp, pm = x07p + x34p, x07p - x34p
    qp, qm = x16p + x25p, x16p - x25p
    want = np.array([
        n * (pp + qp),
        n * (a * x07m - c * x61m + dd * x25m - f * x43m),
        n * (b * pm + e * qm),
        n * (c * x07m + f * x61m - a * x25m + dd * x43m),
        n * (pp - qp),
        n * (dd * x07m + a * x61m + f * x25m - c * x43m),
        n * (e * pm - b * qm),
        n * (f * x07m + dd * x61m + c * x25m + a * x43m),
    ])
    got = dct_basis_np("float64") @ x
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_parseval():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (32, 8, 8)).astype(np.float32)
    c = np.asarray(dct8x8(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.sum(x * x, axis=(1, 2)), np.sum(c * c, axis=(1, 2)), rtol=1e-5)


def test_dct_idct_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (16, 8, 8)).astype(np.float32)
    c = dct8x8(jnp.asarray(x))
    back = np.asarray(idct8x8(c))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_dct_idct_u8_lossless():
    """The BASELINE config-1 property: u8 -> f32 DCT -> IDCT -> round
    recovers every byte exactly (orthonormal transform, fp error << 0.5)."""
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (64, 8, 8), dtype=np.uint8)
    xf = jnp.asarray(x, jnp.float32) / 255.0
    back = np.asarray(idct8x8(dct8x8(xf))) * 255.0
    assert np.array_equal(np.rint(back).astype(np.uint8), x)


def test_dct1d_matches_2d():
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (4, 8, 8)).astype(np.float32)
    two_pass = dct8(dct8(jnp.asarray(x), axis=-1), axis=-2)
    np.testing.assert_allclose(np.asarray(two_pass),
                               np.asarray(dct8x8(jnp.asarray(x))), atol=1e-5)
    rt = idct8(dct8(jnp.asarray(x), axis=-1), axis=-1)
    np.testing.assert_allclose(np.asarray(rt), x, atol=1e-6)


def test_strip_basis_block_diagonal():
    sb = strip_basis_np(16)
    assert sb.shape == (128, 128)
    d = dct_basis_np("float32")
    # Each diagonal 8x8 block is D; off-diagonal blocks are zero.
    for g in range(16):
        np.testing.assert_array_equal(sb[g * 8:(g + 1) * 8, g * 8:(g + 1) * 8], d)
    mask = np.kron(np.eye(16), np.ones((8, 8)))
    assert np.all(sb[mask == 0] == 0)
    # Panel matmul == per-block column DCT.
    rng = np.random.default_rng(6)
    panel = rng.uniform(-1, 1, (128, 64)).astype(np.float32)
    got = sb @ panel
    want = np.concatenate(
        [d @ panel[g * 8:(g + 1) * 8] for g in range(16)], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)
