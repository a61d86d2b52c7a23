"""8-point / 8x8 DCT-II transform math, TPU-first.

The reference (``/root/reference/src/simd_dct.cpp:138-172``, ``inplace_dct8``)
implements the classic even/odd butterfly decomposition of the *orthonormal*
8-point DCT-II: constants ``C_a..C_f = sqrt(2)*cos(k*pi/16)`` and
``C_norm = 1/sqrt(8)``.  Expanding the butterfly shows every output row k is
exactly the orthonormal DCT-II basis row

    D[0, n] = 1/sqrt(8)
    D[k, n] = sqrt(2/8) * cos((2n+1) * k * pi / 16)      (k >= 1)

so ``D @ D.T == I`` and the 2-D block transform is ``C = D @ X @ D.T``.

On TPU we do NOT reproduce the butterfly/shuffle network: the idiomatic
formulation is matmul against the constant basis matrix so the FLOPs land on
the MXU, with the batch of 8x8 blocks as the leading (batched) axis -- the
TPU analog of the reference AVX-512 kernel's "one register lane = one block"
layout (``src/simd_dct.cpp:1939-1946``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# The exact float32 constants of the reference butterfly
# (src/simd_dct.cpp:140-146).  We build the basis matrix out of these values
# (not fresh np.cos calls) so the f32 matrix entries match the reference's
# constants bit-for-bit.
C_A = np.float32(1.3870398453221474618216191915664)   # sqrt(2) * cos(1*pi/16)
C_B = np.float32(1.3065629648763765278566431734272)   # sqrt(2) * cos(2*pi/16)
C_C = np.float32(1.1758756024193587169744671046113)   # sqrt(2) * cos(3*pi/16)
C_D = np.float32(0.78569495838710218127789736765722)  # sqrt(2) * cos(5*pi/16)
C_E = np.float32(0.54119610014619698439972320536639)  # sqrt(2) * cos(6*pi/16)
C_F = np.float32(0.27589937928294301233595756366937)  # sqrt(2) * cos(7*pi/16)
C_NORM = np.float32(0.35355339059327376220042218105242)  # 1/sqrt(8)

# sqrt(2)*cos(4*pi/16) == 1 exactly in this family; the butterfly's even
# outputs 0 and 4 use the raw sums (src/simd_dct.cpp:163,165).
_ONE = np.float32(1.0)


@functools.lru_cache(maxsize=None)
def _basis_f64() -> np.ndarray:
    """Orthonormal DCT-II basis in float64 (for the float64 golden path)."""
    n = np.arange(8)[None, :]
    k = np.arange(8)[:, None]
    d = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    d[0, :] = 1.0 / np.sqrt(8.0)
    return d


@functools.lru_cache(maxsize=None)
def dct_basis_np(dtype: str = "float32") -> np.ndarray:
    """The 8x8 orthonormal DCT-II basis matrix ``D``.

    Rows are assembled from the reference's own f32 constants so that
    ``D @ x`` reproduces the butterfly's per-row linear combination
    (src/simd_dct.cpp:163-171) with the same coefficient values:

        row0: C_norm * [ 1,  1,  1,  1,  1,  1,  1,  1]
        row1: C_norm * [ Ca, Cc, Cd, Cf,-Cf,-Cd,-Cc,-Ca]
        row2: C_norm * [ Cb, Ce,-Ce,-Cb,-Cb,-Ce, Ce, Cb]
        row3: C_norm * [ Cc,-Cf,-Ca,-Cd, Cd, Ca, Cf,-Cc]
        row4: C_norm * [ 1, -1, -1,  1,  1, -1, -1,  1]
        row5: C_norm * [ Cd,-Ca, Cf, Cc,-Cc,-Cf, Ca,-Cd]
        row6: C_norm * [ Ce,-Cb, Cb,-Ce,-Ce, Cb,-Cb, Ce]
        row7: C_norm * [ Cf,-Cd, Cc,-Ca, Ca,-Cc, Cd,-Cf]
    """
    if dtype == "float64":
        return _basis_f64()
    a, b, c, d_, e, f, o = C_A, C_B, C_C, C_D, C_E, C_F, _ONE
    rows = np.array(
        [
            [o, o, o, o, o, o, o, o],
            [a, c, d_, f, -f, -d_, -c, -a],
            [b, e, -e, -b, -b, -e, e, b],
            [c, -f, -a, -d_, d_, a, f, -c],
            [o, -o, -o, o, o, -o, -o, o],
            [d_, -a, f, c, -c, -f, a, -d_],
            [e, -b, b, -e, -e, b, -b, e],
            [f, -d_, c, -a, a, -c, d_, -f],
        ],
        dtype=np.float32,
    )
    return (C_NORM * rows).astype(np.dtype(dtype))


def dct_basis(dtype=jnp.float32) -> jax.Array:
    """``D`` as a JAX array."""
    return jnp.asarray(dct_basis_np(np.dtype(dtype).name))


@functools.lru_cache(maxsize=None)
def strip_basis_np(num_blocks: int, transpose: bool = False,
                   dtype: str = "float32") -> np.ndarray:
    """``kron(I_num_blocks, D)`` -- block-diagonal basis for panel matmuls.

    A ``(8*num_blocks, W)`` image panel left-multiplied by this matrix
    applies the 1-D DCT independently to every vertical 8-group, turning
    the per-block column pass into one large MXU-shaped matmul
    (``num_blocks = 16`` gives the MXU-native 128x128 operand).
    """
    d = dct_basis_np(dtype)
    if transpose:
        d = d.T.copy()
    return np.kron(np.eye(num_blocks, dtype=d.dtype), d)


def strip_basis(num_blocks: int, transpose: bool = False,
                dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(strip_basis_np(num_blocks, transpose,
                                      np.dtype(dtype).name))


def dct8x8(blocks: jax.Array, *, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Forward 2-D DCT on ``(..., 8, 8)`` blocks: ``C = D @ X @ D.T``.

    ``C[..., u, v]``: ``u`` = vertical frequency, ``v`` = horizontal
    frequency when ``X[..., y, x]`` is (row, col) indexed.
    """
    d = dct_basis(blocks.dtype)
    return jnp.einsum("uj,...jk,vk->...uv", d, blocks, d, precision=precision)


def idct8x8(coeffs: jax.Array, *, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Inverse 2-D DCT on ``(..., 8, 8)`` coefficient blocks: ``X = D.T @ C @ D``.

    The reference has no decoder (src/simd_dct.h:29-31 is encode-only); this
    is the north-star round-trip addition.  Exact inverse because ``D`` is
    orthonormal.
    """
    d = dct_basis(coeffs.dtype)
    return jnp.einsum("ju,...jk,kv->...uv", d, coeffs, d, precision=precision)


def dct8(vecs: jax.Array, axis: int = -1,
         *, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """1-D 8-point DCT-II along ``axis`` (must have length 8)."""
    d = dct_basis(vecs.dtype)
    moved = jnp.moveaxis(vecs, axis, -1)
    out = jnp.einsum("kj,...j->...k", d, moved, precision=precision)
    return jnp.moveaxis(out, -1, axis)


def idct8(vecs: jax.Array, axis: int = -1,
          *, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """1-D inverse 8-point DCT along ``axis``."""
    d = dct_basis(vecs.dtype)
    moved = jnp.moveaxis(vecs, axis, -1)
    out = jnp.einsum("jk,...j->...k", d, moved, precision=precision)
    return jnp.moveaxis(out, -1, axis)
