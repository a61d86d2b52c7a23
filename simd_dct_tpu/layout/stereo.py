"""Stereo dual-view geometry helpers.

Every reference mode treats the (H, W) buffer as two vertically stacked
views of height H/2 (src/simd_dct.cpp:268 et al.; SURVEY.md §2.3): the
non-stereo modes encode only the first view per call, the stereo mode
encodes both.
"""

from __future__ import annotations

import jax.numpy as jnp


def split_views(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., 2, H/2, W): [left/top, right/bottom] views."""
    *lead, h, w = img.shape
    return img.reshape(*lead, 2, h // 2, w)


def stack_views(views: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, H/2, W) -> (..., H, W)."""
    *lead, two, h2, w = views.shape
    assert two == 2
    return views.reshape(*lead, 2 * h2, w)


def top_view(img: jnp.ndarray) -> jnp.ndarray:
    """The first (top) view -- what enc-quant/enc-quant32 encode."""
    h = img.shape[-2]
    return img[..., : h // 2, :]
