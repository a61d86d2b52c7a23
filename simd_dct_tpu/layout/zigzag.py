"""Zigzag coefficient ordering (north-star addition, BASELINE.json config 3).

The reference has no zigzag (its reorder layouts are plane/group-major);
JPEG-style pipelines want it, so it ships as a first-class layout transform.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def zigzag_order() -> np.ndarray:
    """perm[k] = (fy*8 + fx) index of the k-th zigzag coefficient."""
    order = sorted(
        ((y, x) for y in range(8) for x in range(8)),
        key=lambda p: (p[0] + p[1],
                       p[0] if (p[0] + p[1]) % 2 else p[1]),
    )
    return np.array([y * 8 + x for y, x in order], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def zigzag_inverse_order() -> np.ndarray:
    perm = zigzag_order()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(64, dtype=np.int32)
    return inv


def to_zigzag(bufs: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) fy-major coefficient records -> zigzag order."""
    return jnp.take(bufs, jnp.asarray(zigzag_order()), axis=-1)


def from_zigzag(bufs: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(bufs, jnp.asarray(zigzag_inverse_order()), axis=-1)
