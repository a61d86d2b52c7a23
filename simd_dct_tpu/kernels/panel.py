"""Panel-matmul engine: MXU-shaped DCT formulation shared by the fast paths.

XLA's lowering of ``(...,8,8)`` einsums pads every 8-wide minor axis to the
128-lane vreg width (15/16 waste; measured 0.7 GB/s on v5e).  This module
reformulates both DCT passes over 128-row x 128-col tiles as (128,128)
matmuls against permuted block-diagonal bases built from ``kron(I_16, D)``
(SURVEY.md §3.2 — the TPU translation of the reference AVX-512 kernel's
batched-blocks design, src/simd_dct.cpp:1869-2059):

    B[u*16 + m, 8m + r]         = D[u, r]     (column DCT, u-major rows)
    A[8(8g+b) + c, g*64+v*8+b]  = D[v, c]     (row DCT, (g,v,b)-ordered cols)

so the transformed tile is ``Z[u*16+m, g*64+v*8+b]`` = coeff (u,v) of block
(m, 8g+b) — all output permutations live in the constant bases, and the
mode-specific byte records fall out of plain reshapes/transposes of Z.

Used by the XLA tier (this file) and the Pallas kernels (pallas_dct.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dct import dct_basis_np
from ..core.golden import pair_cell_permutation


@functools.lru_cache(maxsize=None)
def row_basis_np() -> np.ndarray:
    """B: column-DCT basis, output rows u-major (see module docstring)."""
    d = dct_basis_np("float32")
    b = np.zeros((128, 128), np.float32)
    for u in range(8):
        for m in range(16):
            b[u * 16 + m, m * 8: m * 8 + 8] = d[u]
    return b


@functools.lru_cache(maxsize=None)
def col_basis_np() -> np.ndarray:
    """A: row-DCT basis, output columns (group, v, block)-ordered."""
    d = dct_basis_np("float32")
    a = np.zeros((128, 128), np.float32)
    for g in range(2):
        for v in range(8):
            for b in range(8):
                n = 8 * g + b
                a[n * 8: n * 8 + 8, g * 64 + v * 8 + b] = d[v]
    return a


def supports(h2: int, w: int) -> bool:
    """Panel engine geometry gate (else the generic einsum path runs)."""
    return h2 % 128 == 0 and w % 128 == 0


def q_tile(scales64: jax.Array, orientation: str) -> jax.Array:
    """(128,128) quant multiplier aligned with Z's (u-major, (g,v,b)) axes.

    ``orientation`` selects the LUT buffer order: 'fy' (p = u*8+v; stereo
    and mode32) or 'fx' (p = v*8+u; enc-quant)."""
    q8 = jnp.asarray(scales64, jnp.float32).reshape(8, 8)
    if orientation == "fx":
        q8 = q8.T                        # q8[u, v] = scales[v*8 + u]
    rows = jnp.repeat(q8, 16, axis=0)    # (128, 8)
    qb = jnp.repeat(rows, 8, axis=1)     # (128, 64)
    return jnp.concatenate([qb, qb], axis=1)


def _quantize(x: jax.Array, rounding: str) -> jax.Array:
    if rounding == "rne":
        v = jnp.rint(x).astype(jnp.int32) + 127
        return jnp.clip(v, 0, 255).astype(jnp.uint8)
    if rounding == "clamp_first":
        return jnp.rint(jnp.clip(x + 127.0, 0.0, 255.0)).astype(jnp.uint8)
    v = jnp.clip(x / 255.0 + np.float32(127.0 / 255.0), 0.0, 1.0) * 255.0
    return jnp.floor(v + 0.5).astype(jnp.uint8)


def forward_tiles(view: jax.Array, scales: jax.Array, *, normalize: bool,
                  orientation: str, rounding: str) -> jax.Array:
    """(H2, W) u8 -> quantized tile tensor (P, 128, NJ, 128) u8 with axes
    [panel, u*16+m, chunk, g*64+v*8+b]."""
    h2, w = view.shape
    p, nj = h2 // 128, w // 128
    x4 = view.reshape(p, 128, nj, 128).astype(jnp.float32)
    if normalize:
        x4 = x4 * jnp.float32(1.0 / 255.0)
    b = jnp.asarray(row_basis_np())
    a = jnp.asarray(col_basis_np())
    y = jnp.einsum("uR,pRjk->pujk", b, x4)
    z = jnp.einsum("pujk,kv->pujv", y, a)
    zq = z * q_tile(scales, orientation)[None, :, None, :]
    return _quantize(zq, rounding)


def inverse_tiles(tiles: jax.Array, inv_scales: jax.Array, *,
                  normalize: bool, orientation: str) -> jax.Array:
    """Inverse of forward_tiles: (P, 128, NJ, 128) u8 -> (H2, W) u8."""
    p, _, nj, _ = tiles.shape
    qi = q_tile(inv_scales, orientation)
    z = (tiles.astype(jnp.float32) - 127.0) * qi[None, :, None, :]
    b = jnp.asarray(row_basis_np())
    a = jnp.asarray(col_basis_np())
    # X = B^T @ Z @ A^T (B, A are permuted orthonormal).
    y = jnp.einsum("uR,pujk->pRjk", b, z)
    x4 = jnp.einsum("pRjk,vk->pRjv", y, a)
    if normalize:
        x4 = x4 * jnp.float32(255.0)
    out = jnp.clip(jnp.rint(x4), 0, 255).astype(jnp.uint8)
    return out.reshape(p * 128, nj * 128)


# -- byte-record assembly per mode (tiles <-> flat byte streams) ----------

def tiles_to_group8(tiles: jax.Array) -> jax.Array:
    """mode32 records: strip byte (j*1024 + g*512 + u*64 + v*8 + b)."""
    p, _, nj, _ = tiles.shape
    t6 = tiles.reshape(p, 8, 16, nj, 2, 64)         # (p,u,m,j,g,vb)
    rec = t6.transpose(0, 2, 3, 4, 1, 5)            # (p,m,j,g,u,vb)
    return rec.reshape(-1)


def group8_to_tiles(flat: jax.Array, h2: int, w: int) -> jax.Array:
    p, nj = h2 // 128, w // 128
    rec = flat.reshape(p, 16, nj, 2, 8, 64)
    t6 = rec.transpose(0, 4, 1, 2, 3, 5)
    return t6.reshape(p, 128, nj, 128)


def tiles_to_block_contiguous(tiles: jax.Array) -> jax.Array:
    """enc-quant scalar records: strip byte (n*64 + v*8 + u), n = j*16+g*8+b."""
    p, _, nj, _ = tiles.shape
    t7 = tiles.reshape(p, 8, 16, nj, 2, 8, 8)       # (p,u,m,j,g,v,b)
    rec = t7.transpose(0, 2, 3, 4, 6, 5, 1)         # (p,m,j,g,b,v,u)
    return rec.reshape(-1)


def block_contiguous_to_tiles(flat: jax.Array, h2: int, w: int) -> jax.Array:
    p, nj = h2 // 128, w // 128
    rec = flat.reshape(p, 16, nj, 2, 8, 8, 8)       # (p,m,j,g,b,v,u)
    t7 = rec.transpose(0, 6, 1, 2, 3, 5, 4)         # (p,u,m,j,g,v,b)
    return t7.reshape(p, 128, nj, 128)


@functools.lru_cache(maxsize=None)
def _pair_lane_perm_128() -> np.ndarray:
    """128-lane permutation: cell byte k <- record byte perm[k] within one
    2-block cell (intended non-overlapping SIMD pair layout)."""
    perm = pair_cell_permutation(False)
    inv = np.empty(128, np.int64)
    for blk in range(2):
        for pp in range(64):
            inv[perm[blk, pp]] = blk * 64 + pp
    return inv


def tiles_to_pair(tiles: jax.Array) -> jax.Array:
    flat = tiles_to_block_contiguous(tiles)
    cells = flat.reshape(-1, 128)
    out = jnp.take(cells, jnp.asarray(_pair_lane_perm_128()), axis=1)
    return out.reshape(-1)


def pair_to_tiles(flat: jax.Array, h2: int, w: int) -> jax.Array:
    perm = pair_cell_permutation(False).reshape(-1)
    cells = flat.reshape(-1, 128)
    rec = jnp.take(cells, jnp.asarray(perm, jnp.int32), axis=1)
    return block_contiguous_to_tiles(rec.reshape(-1), h2, w)


def tiles_to_planar(tiles_lr: jax.Array) -> jax.Array:
    """stereo planar: tiles for both views (2, P, 128, NJ, 128) -> flat
    64-plane stream; plane p=(u,v) holds per strip BW left then BW right
    bytes (src/simd_dct.cpp:258-264,284-294)."""
    two, p, _, nj, _ = tiles_lr.shape
    t8 = tiles_lr.reshape(2, p, 8, 16, nj, 2, 8, 8)   # (view,p,u,m,j,g,v,b)
    planes = t8.transpose(2, 6, 1, 3, 0, 4, 5, 7)     # (u,v,p,m,view,j,g,b)
    return planes.reshape(-1)


def planar_to_tiles(flat: jax.Array, h2: int, w: int) -> jax.Array:
    p, nj = h2 // 128, w // 128
    planes = flat.reshape(8, 8, p, 16, 2, nj, 2, 8)
    t8 = planes.transpose(4, 2, 0, 3, 5, 6, 1, 7)     # (view,p,u,m,j,g,v,b)
    return t8.reshape(2, p, 128, nj, 128)
