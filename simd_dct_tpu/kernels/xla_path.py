"""Pure-XLA (jnp) implementation of every mode — the portable fallback tier.

This tier is the analog of the reference's SSE kernels: correct, fast,
runs anywhere XLA does (CPU/TPU), with all heavy lifting expressed as
einsums + gathers that XLA fuses.  The Pallas tier (pallas_dct.py) is
the AVX-512-analog fast path on real TPU hardware.

All functions are jit-friendly: static shapes, no data-dependent Python
control flow; the startY/endY strip range becomes a static per-strip mask
(strip s covers image rows [8s, 8s+8) of the first view and is included
iff ``start_y <= 16*s <= end_y`` — the SIMD kernels' ``y*2`` convention,
src/simd_dct.cpp:1686-1696).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dct import dct8x8, idct8x8
from ..core.quantize import quantize_to_u8, dequantize_from_u8, quant_scales, dequant_scales
from ..layout import blocks as L_blocks
from ..layout import reorder as L_reorder
from . import panel as P


def _strip_mask(num_strips: int, start_y: int, end_y: int,
                legacy_range: bool = False) -> np.ndarray:
    s = np.arange(num_strips)
    y = s * 8
    cmp = y if legacy_range else y * 2
    return (cmp >= start_y) & (cmp <= end_y)


def _coeff_buffers(view_u8: jnp.ndarray, normalize: bool,
                   orientation: str) -> jnp.ndarray:
    """(S*8, W) u8 -> (S, BW, 64) f32 coefficient buffers."""
    x = L_blocks.blockize(view_u8).astype(jnp.float32)
    if normalize:
        x = x * jnp.float32(1.0 / 255.0)
    c = dct8x8(x)
    return L_reorder.coeffs_to_buffer(c, orientation)


def _buffers_to_view(bufs: jnp.ndarray, normalize: bool,
                     orientation: str) -> jnp.ndarray:
    """(S, BW, 64) f32 coefficient buffers -> (S*8, W) u8 pixels."""
    c = L_reorder.buffer_to_coeffs(bufs, orientation)
    x = idct8x8(c)
    if normalize:
        x = x * jnp.float32(255.0)
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8) \
        .reshape(c.shape[0], c.shape[1], 8, 8) \
        .transpose(0, 2, 1, 3) \
        .reshape(c.shape[0] * 8, c.shape[1] * 8)


def _apply_mask(flat: jnp.ndarray, mask: np.ndarray,
                bytes_per_strip: int) -> jnp.ndarray:
    if mask.all():
        return flat
    m = jnp.repeat(jnp.asarray(mask), bytes_per_strip)
    return jnp.where(m, flat, jnp.uint8(0))


# ---------------------------------------------------------------------------
# enc-quant (block-contiguous / pair-cell), top view only
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def encode_quantize(img: jnp.ndarray, lut: jnp.ndarray,
                    start_y: int = 0, end_y: int = 1 << 30,
                    rounding: str = "rne", layout: str = "scalar",
                    legacy_range: bool = False) -> jnp.ndarray:
    """simdDCT_EncodeQuantizeBuffer semantics (src/simd_dct.cpp:93-111)."""
    h, w = img.shape
    top = img[: h // 2, :]
    scales = quant_scales(lut)
    if P.supports(h // 2, w):
        tiles = P.forward_tiles(top, scales, normalize=True,
                                orientation="fx", rounding=rounding)
        flat = (P.tiles_to_block_contiguous(tiles) if layout == "scalar"
                else P.tiles_to_pair(tiles))
    else:
        bufs = _coeff_buffers(top, normalize=True, orientation="fx")
        data = quantize_to_u8(bufs, scales, rounding)
        flat = (L_reorder.block_contiguous(data) if layout == "scalar"
                else L_reorder.pair_cells(data))
    mask = _strip_mask(h // 16, start_y, end_y, legacy_range)
    if layout == "pair_as_written":
        return L_reorder.pair_as_written_masked(flat, mask, 8 * w)
    return _apply_mask(flat, mask, 8 * w)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def decode_quantize(data: jnp.ndarray, lut: jnp.ndarray,
                    size_x: int, size_y: int,
                    layout: str = "scalar") -> jnp.ndarray:
    """Inverse of encode_quantize -> reconstructed top view (H/2, W) u8."""
    if P.supports(size_y // 2, size_x):
        tiles = (P.block_contiguous_to_tiles(data, size_y // 2, size_x)
                 if layout == "scalar"
                 else P.pair_to_tiles(data, size_y // 2, size_x))
        return P.inverse_tiles(tiles, dequant_scales(lut), normalize=True,
                               orientation="fx")
    bw = size_x // 8
    bufs = (L_reorder.block_contiguous_inverse(data, bw) if layout == "scalar"
            else L_reorder.pair_cells_inverse(data, bw))
    coeffs = dequantize_from_u8(bufs, dequant_scales(lut))
    return _buffers_to_view(coeffs, normalize=True, orientation="fx")


# ---------------------------------------------------------------------------
# enc-quant32 (group-of-8 coefficient-major), raw domain, top view only
# ---------------------------------------------------------------------------

def encode32_view(view: jnp.ndarray, lut: jnp.ndarray,
                  rounding: str = "rne") -> jnp.ndarray:
    """Mode32 encode of a bare (H2, W) view (no dual-view slicing) ->
    flat records.  Building block for the sharded path (dist.sharding)."""
    h2, w = view.shape
    if P.supports(h2, w):
        tiles = P.forward_tiles(view, quant_scales(lut), normalize=False,
                                orientation="fy", rounding=rounding)
        return P.tiles_to_group8(tiles)
    bufs = _coeff_buffers(view, normalize=False, orientation="fy")
    data = quantize_to_u8(bufs, quant_scales(lut), rounding)
    return L_reorder.group8(data)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def encode_quantize32(img: jnp.ndarray, lut: jnp.ndarray,
                      start_y: int = 0, end_y: int = 1 << 30,
                      rounding: str = "rne") -> jnp.ndarray:
    """simdDCT_EncodeQuantize32ReorderBuffer semantics
    (src/simd_dct.cpp:1869-2059): RAW 0..255 domain, fy-major buffers,
    coefficient-major 512-byte group records."""
    h, w = img.shape
    top = img[: h // 2, :]
    if P.supports(h // 2, w):
        tiles = P.forward_tiles(top, quant_scales(lut), normalize=False,
                                orientation="fy", rounding=rounding)
        flat = P.tiles_to_group8(tiles)
    else:
        bufs = _coeff_buffers(top, normalize=False, orientation="fy")
        data = quantize_to_u8(bufs, quant_scales(lut), rounding)
        flat = L_reorder.group8(data)
    mask = _strip_mask(h // 16, start_y, end_y)
    return _apply_mask(flat, mask, 8 * w)


@functools.partial(jax.jit, static_argnums=(2, 3))
def decode_quantize32(data: jnp.ndarray, lut: jnp.ndarray,
                      size_x: int, size_y: int) -> jnp.ndarray:
    if P.supports(size_y // 2, size_x):
        tiles = P.group8_to_tiles(data, size_y // 2, size_x)
        return P.inverse_tiles(tiles, dequant_scales(lut), normalize=False,
                               orientation="fy")
    bufs = L_reorder.group8_inverse(data, size_x // 8)
    coeffs = dequantize_from_u8(bufs, dequant_scales(lut))
    return _buffers_to_view(coeffs, normalize=False, orientation="fy")


# ---------------------------------------------------------------------------
# stereo (fully coefficient-planar), both views
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def encode_quantize_stereo(img: jnp.ndarray, lut: jnp.ndarray,
                           start_y: int = 0, end_y: int = 1 << 30,
                           rounding: str = "rne") -> jnp.ndarray:
    """simdDCT_EncodeQuantizeReorderStereoBuffer semantics
    (src/simd_dct.cpp:71-91): both views, fy-major buffers, 64 coefficient
    planes with per-strip left/right interleave."""
    h, w = img.shape
    views = img.reshape(2, h // 2, w)
    if P.supports(h // 2, w):
        tiles = jax.vmap(
            lambda v: P.forward_tiles(v, quant_scales(lut), normalize=True,
                                      orientation="fy", rounding=rounding)
        )(views)
        flat = P.tiles_to_planar(tiles)
    else:
        bufs = jax.vmap(
            lambda v: _coeff_buffers(v, normalize=True, orientation="fy")
        )(views)  # (2, S, BW, 64)
        data = quantize_to_u8(bufs, quant_scales(lut), rounding)
        flat = L_reorder.planar_stereo(data)
    # plane bytes per strip = W/4 (both views), cursor semantics of
    # src/simd_dct.cpp:275: mask each strip's slice within every plane.
    mask = _strip_mask(h // 16, start_y, end_y)
    if not mask.all():
        m = jnp.tile(jnp.repeat(jnp.asarray(mask), w // 4), 64)
        flat = jnp.where(m, flat, jnp.uint8(0))
    return flat


@functools.partial(jax.jit, static_argnums=(2, 3))
def decode_quantize_stereo(data: jnp.ndarray, lut: jnp.ndarray,
                           size_x: int, size_y: int) -> jnp.ndarray:
    if P.supports(size_y // 2, size_x):
        tiles = P.planar_to_tiles(data, size_y // 2, size_x)
        views = jax.vmap(
            lambda t: P.inverse_tiles(t, dequant_scales(lut), normalize=True,
                                      orientation="fy")
        )(tiles)
        return views.reshape(size_y, size_x)
    s = size_y // 16
    bufs = L_reorder.planar_stereo_inverse(data, s, size_x // 8)
    coeffs = dequantize_from_u8(bufs, dequant_scales(lut))
    views = jax.vmap(
        lambda b: _buffers_to_view(b, normalize=True, orientation="fy")
    )(coeffs)
    return views.reshape(size_y, size_x)
