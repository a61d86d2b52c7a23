"""Color plane transforms (north-star addition, BASELINE.json configs 2-3).

The reference is grayscale-only; 4K RGB round-trips need interleaved->planar
deinterleave and (for JPEG-style luma/chroma quantization) YCbCr.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# JPEG-standard chroma quantization table (Annex K), normalized to the same
# 0..~1.21 scale as the reference's luma-like base table (src/main.cpp:179-189
# divides classic tables by ~100).
BASE_CHROMA_QUANT_TABLE = np.array(
    [
        0.17, 0.18, 0.24, 0.47, 0.99, 0.99, 0.99, 0.99,
        0.18, 0.21, 0.26, 0.66, 0.99, 0.99, 0.99, 0.99,
        0.24, 0.26, 0.56, 0.99, 0.99, 0.99, 0.99, 0.99,
        0.47, 0.66, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
        0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
        0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
        0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
        0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
    ],
    dtype=np.float32,
)


def rgb_to_planar(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) interleaved -> (..., 3, H, W) planar."""
    return jnp.moveaxis(img, -1, -3)


def planar_to_rgb(planes: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) planar -> (..., H, W, 3) interleaved."""
    return jnp.moveaxis(planes, -3, -1)


# BT.601 full-range YCbCr (the JPEG convention).
_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735891647856, -0.331264108352144, 0.5],
        [0.5, -0.418687589158345, -0.081312410841655],
    ],
    dtype=np.float32,
)
_YCC2RGB = np.linalg.inv(_RGB2YCC).astype(np.float32)


def rgb_to_ycbcr(img: jnp.ndarray) -> jnp.ndarray:
    """u8 (..., H, W, 3) RGB -> f32 (..., H, W, 3) YCbCr (Cb/Cr biased +128)."""
    x = img.astype(jnp.float32)
    ycc = jnp.einsum("ij,...j->...i", jnp.asarray(_RGB2YCC), x)
    return ycc + jnp.asarray([0.0, 128.0, 128.0], jnp.float32)


def ycbcr_to_rgb(ycc: jnp.ndarray) -> jnp.ndarray:
    """f32 YCbCr -> u8 RGB (clamped, RNE)."""
    x = ycc - jnp.asarray([0.0, 128.0, 128.0], jnp.float32)
    rgb = jnp.einsum("ij,...j->...i", jnp.asarray(_YCC2RGB), x)
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)
