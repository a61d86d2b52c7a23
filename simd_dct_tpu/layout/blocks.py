"""Space-to-depth blocking: image planes <-> batches of 8x8 blocks.

The TPU-native replacement for the reference kernels' load/transpose
networks (e.g. src/simd_dct.cpp:1901-1948): blocking is a pure reshape /
transpose, fused by XLA into whatever consumes it.
"""

from __future__ import annotations

import jax.numpy as jnp

BLOCK = 8


def blockize(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H/8, W/8, 8, 8) with (row, col) minor axes."""
    *lead, h, w = img.shape
    if h % BLOCK or w % BLOCK:
        raise ValueError(f"image dims must be multiples of 8, got {(h, w)}")
    x = img.reshape(*lead, h // BLOCK, BLOCK, w // BLOCK, BLOCK)
    return jnp.moveaxis(x, -3, -2)


def unblockize(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., H/8, W/8, 8, 8) -> (..., H, W)."""
    *lead, bh, bw, b0, b1 = blocks.shape
    assert b0 == BLOCK and b1 == BLOCK
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(*lead, bh * BLOCK, bw * BLOCK)
