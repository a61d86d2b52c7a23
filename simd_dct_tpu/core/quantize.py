"""Quantization / dequantization matching the reference's per-mode semantics.

The reference quantizes each of the 64 coefficients of a block by a
caller-supplied 64-entry float LUT with a fixed ``vr = 0.95`` headroom
factor, biases by +127 and clamps to u8.  Three numeric variants exist:

* ``rne``  -- the SSE4.1/AVX semantics (the "most compliant and fastest"
  path, src/simd_dct.cpp:665-668): ``clamp_int(rne(c * q) + 127, 0, 255)``
  where ``rne`` is round-to-nearest-even (``_mm_cvtps_epi32``,
  src/simd_dct.cpp:1020-1024,1648-1652,2024).  This is the default compat
  target on TPU (``jnp.rint`` is RNE too).
* ``scalar`` -- the NoSimd semantics (src/simd_dct.cpp:245,361-362):
  ``round_half_away(clamp(c*q/255 + 127/255, 0, 1) * 255)``.
* ``clamp_first`` -- the SSE2/SSSE3 stereo semantics
  (src/simd_dct.cpp:1245-1249): clamp in float to [0,255] after bias, then
  convert (RNE).

Normalization differs per mode and is NOT applied here -- callers pass
coefficients in whichever scale their mode uses:

* enc-quant / stereo modes normalize pixels by 1/255 on input and use
  ``q = 255 / (LUT * 0.95)``  (src/simd_dct.cpp:949-956,910-925).
* enc-quant32 keeps raw 0..255 pixels and *still* uses
  ``q = 255 / (LUT * 0.95)`` (src/simd_dct.cpp:2033-2036) -- i.e. that
  mode's quantization is a factor of 255 hotter.  We reproduce this
  faithfully per mode.

The scalar kernels use ``q = 1 / (LUT * 0.95)`` on 1/255-normalized input
with the ``/255``-domain bias -- mathematically the same scale as the SSE
paths, differing only in rounding/clamp order (captured by ``scalar``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

VR = np.float32(0.95)        # headroom factor (src/simd_dct.cpp:191,905,1871)
BIAS = np.float32(127.0)     # +127 coefficient bias (src/simd_dct.cpp:906,1880)

ROUNDING_MODES = ("rne", "scalar", "clamp_first")

# The CLI's base quantize table -- JPEG-luma-like values in 0.10..1.21
# (src/main.cpp:179-189), scaled in place by ``--quality``
# (src/main.cpp:214-217; note the default 50 is only applied when the flag
# is actually passed -- reproduced in our CLI).
BASE_QUANT_TABLE = np.array(
    [
        0.17, 0.11, 0.10, 0.16, 0.24, 0.40, 0.51, 0.61,
        0.12, 0.12, 0.14, 0.19, 0.26, 0.58, 0.60, 0.55,
        0.14, 0.13, 0.16, 0.24, 0.40, 0.57, 0.69, 0.56,
        0.14, 0.17, 0.22, 0.29, 0.51, 0.87, 0.80, 0.62,
        0.18, 0.22, 0.37, 0.56, 0.68, 1.09, 1.03, 0.77,
        0.24, 0.35, 0.55, 0.64, 0.81, 1.04, 1.13, 0.92,
        0.49, 0.64, 0.78, 0.87, 1.03, 1.21, 1.20, 1.01,
        0.72, 0.92, 0.95, 0.98, 1.12, 1.00, 1.03, 0.99,
    ],
    dtype=np.float32,
)


def default_quant_lut(quality: float | None = None) -> np.ndarray:
    """The CLI's 64-entry LUT, optionally scaled by ``--quality``.

    Matches src/main.cpp:179-189,214-217: quality multiplies every entry;
    when no quality is given the base table is used unscaled.
    """
    lut = BASE_QUANT_TABLE.copy()
    if quality is not None:
        lut *= np.float32(quality)
    return lut


def quant_scales(lut: np.ndarray | jax.Array) -> jax.Array:
    """``q[p] = 255 / (lut[p] * 0.95)`` -- the SSE/AVX quant multiplier
    (src/simd_dct.cpp:910-925,2033-2036)."""
    lut = jnp.asarray(lut, jnp.float32)
    return np.float32(255.0) / (lut * VR)


def dequant_scales(lut: np.ndarray | jax.Array) -> jax.Array:
    """Inverse multiplier for the decode path: ``(lut * 0.95) / 255``."""
    lut = jnp.asarray(lut, jnp.float32)
    return (lut * VR) / np.float32(255.0)


def quantize_to_u8(coeffs: jax.Array, scales: jax.Array,
                   rounding: str = "rne") -> jax.Array:
    """Quantize float coefficients to biased u8 per the selected variant.

    ``coeffs`` and ``scales`` broadcast together; the caller has already
    aligned LUT entries with coefficient buffer order (which differs per
    mode -- see layout.reorder).
    """
    x = coeffs * scales
    if rounding == "rne":
        # _mm_cvtps_epi32 (RNE) then integer min/max clamp.
        v = jnp.rint(x).astype(jnp.int32) + 127
        v = jnp.clip(v, 0, 255)
        return v.astype(jnp.uint8)
    if rounding == "clamp_first":
        # SSE2/SSSE3 stereo: float clamp after bias, then RNE convert
        # (src/simd_dct.cpp:1245-1249).
        v = jnp.clip(x + BIAS, 0.0, 255.0)
        return jnp.rint(v).astype(jnp.uint8)
    if rounding == "scalar":
        # NoSimd: work in the /255 domain, clamp [0,1], scale, then
        # roundf == round-half-away-from-zero (src/simd_dct.cpp:245).
        v = jnp.clip(x / 255.0 + BIAS / 255.0, 0.0, 1.0) * 255.0
        # round-half-away for non-negative v: floor(v + 0.5)
        return jnp.floor(v + 0.5).astype(jnp.uint8)
    raise ValueError(f"unknown rounding mode {rounding!r}; "
                     f"expected one of {ROUNDING_MODES}")


def dequantize_from_u8(data: jax.Array, inv_scales: jax.Array) -> jax.Array:
    """Invert ``quantize_to_u8``: ``(byte - 127) * (lut * 0.95) / 255``.

    North-star decode addition (no decoder exists in the reference).
    """
    centered = data.astype(jnp.float32) - BIAS
    return centered * inv_scales
