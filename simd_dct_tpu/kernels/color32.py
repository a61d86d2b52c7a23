"""Fused YCbCr + mode32 Pallas kernels — the color fast path.

North-star addition (BASELINE configs 2-3; the reference at
/root/reference is grayscale-only, src/simd_dct.h:29-31): 4K RGB frames
encoded as JPEG-style Y/Cb/Cr with per-channel quant tables.  The
unfused pipeline (``layout.color.rgb_to_ycbcr`` in XLA + three per-plane
kernel calls) materializes the YCbCr planes in HBM — 2 extra full-frame
passes plus an f32 einsum.  Here the BT.601 3x3 mix rides the VPU inside
the mode32 kernel, so HBM traffic stays at 3 u8 bytes in + 3 out per
pixel:

* encode:  (3, H2, W) planar RGB -> (3, S, 8W) mode32 records
  (Y with the luma LUT, Cb/Cr with the chroma LUT; raw 0..255 domain —
  the mode32 quant quirk, src/simd_dct.cpp:2033-2036)
* decode:  records -> (3, H2, W) planar RGB (inverse mix in-kernel)
* roundtrip: RGB -> RGB without the records ever leaving VMEM

Unlike the composition through ``rgb_to_ycbcr`` the fused path never
rounds YCbCr to u8 between the mix and the DCT (one fewer quantization);
outputs therefore match the composition to +-1 byte rather than exactly,
which is the better-quality side of the difference.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quantize import quant_scales, dequant_scales
from ..layout.color import _RGB2YCC, _YCC2RGB
from .pallas_dct import (PANEL, CHUNK, _row_basis_np, _col_basis_np,
                         _q_big, _quantize_tile)

_YCC_BIAS = (0.0, 128.0, 128.0)


def _enc32_rgb_kernel(x_ref, b_ref, a_ref, ql_ref, qc_ref, out_ref, *,
                      rounding: str, num_chunks: int, dtype, halves: int):
    """x_ref (3, halves*128, W) planar RGB -> out_ref (3, 16*halves, 8W)
    mode32 strip records per channel (store layout derivation:
    pallas_dct._enc32_kernel)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    q_tiles = (ql_ref[...], qc_ref[...], qc_ref[...])

    def chunk(c, carry):
        # one RGB load per (half, chunk); three mixes + DCTs from it
        tiles = [[], [], []]                 # [channel][half]
        for h in range(halves):
            rgb = [x_ref[ch, pl.ds(h * PANEL, PANEL),
                         pl.ds(c * CHUNK, CHUNK)]
                   .astype(jnp.int32).astype(jnp.float32) for ch in range(3)]
            for ch in range(3):
                m = _RGB2YCC[ch]
                x = (rgb[0] * np.float32(m[0]) + rgb[1] * np.float32(m[1])
                     + rgb[2] * np.float32(m[2])
                     + np.float32(_YCC_BIAS[ch])).astype(dtype)
                y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
                    .astype(dtype)
                z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
                tiles[ch].append(_quantize_tile(z * q_tiles[ch], rounding))
        for ch in range(3):
            for g in range(2):
                for k in range(4):
                    pieces = [jnp.concatenate(
                        [t[(2 * k) * 16:(2 * k + 1) * 16,
                           g * 64:(g + 1) * 64],
                         t[(2 * k + 1) * 16:(2 * k + 2) * 16,
                           g * 64:(g + 1) * 64]], axis=1)
                        for t in tiles[ch]]
                    piece = (pieces[0] if halves == 1
                             else jnp.concatenate(pieces, axis=0))
                    out_ref[ch, :, pl.ds(c * 1024 + g * 512 + k * 128,
                                         128)] = piece
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("rounding", "interpret",
                                             "precision"))
def _enc32_rgb_panels(planes: jax.Array, luma: jax.Array, chroma: jax.Array,
                      *, rounding: str = "rne", interpret: bool = False,
                      precision: str = "bf16") -> jax.Array:
    """(3, H2, W) u8 planar RGB -> (3, S, 8W) u8 YCbCr mode32 records
    (any H2 % 8 == 0; final partial panel via edge-block masking)."""
    _, h2, w = planes.shape
    assert h2 % 8 == 0 and w % CHUNK == 0
    halves = 2 if h2 > PANEL else 1
    num_steps = -(-h2 // (PANEL * halves))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_enc32_rgb_kernel, rounding=rounding,
                               num_chunks=w // CHUNK, dtype=dtype,
                               halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((3, PANEL * halves, w), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((3, 16 * halves, 8 * w), lambda p: (0, p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=6 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(planes, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(quant_scales(luma)), _q_big(quant_scales(chroma)))


def _gather_zq(rec_ref, ch, h, c):
    """Reassemble the (128,128) quantized Z tile of chunk ``c`` from the
    channel's byte records (inverse of the encode stores)."""
    bands = []
    for k in range(4):
        g0 = rec_ref[ch, pl.ds(h * 16, 16), pl.ds(c * 1024 + k * 128, 128)]
        g1 = rec_ref[ch, pl.ds(h * 16, 16),
                     pl.ds(c * 1024 + 512 + k * 128, 128)]
        bands.append(jnp.concatenate([g0[:, :64], g1[:, :64]], axis=1))
        bands.append(jnp.concatenate([g0[:, 64:], g1[:, 64:]], axis=1))
    return jnp.concatenate(bands, axis=0)        # (128, 128) u8


def _dec32_rgb_kernel(rec_ref, b_ref, a_ref, qil_ref, qic_ref, out_ref, *,
                      num_chunks: int, dtype, halves: int):
    """rec_ref (3, 16*halves, 8W) -> out_ref (3, halves*128, W) planar RGB
    (per-channel IDCT then the inverse BT.601 mix, all in-kernel)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_tiles = (qil_ref[...], qic_ref[...], qic_ref[...])

    for h in range(halves):
        def chunk(c, carry):
            ycc = []
            for ch in range(3):
                zb = _gather_zq(rec_ref, ch, h, c)
                z = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                     * qi_tiles[ch]).astype(dtype)
                y = jax.lax.dot_general(z, amat, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) \
                    .astype(dtype)
                x = jax.lax.dot_general(bmat, y, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                ycc.append(x - np.float32(_YCC_BIAS[ch]))
            for ch in range(3):
                m = _YCC2RGB[ch]
                px = (ycc[0] * np.float32(m[0]) + ycc[1] * np.float32(m[1])
                      + ycc[2] * np.float32(m[2]))
                v = jnp.clip(jnp.rint(px), 0.0, 255.0)
                out_ref[ch, pl.ds(h * PANEL, PANEL),
                        pl.ds(c * CHUNK, CHUNK)] = \
                    v.astype(jnp.int32).astype(jnp.uint8)
            return carry

        jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def _dec32_rgb_panels(records: jax.Array, luma: jax.Array, chroma: jax.Array,
                      *, interpret: bool = False,
                      precision: str = "bf16") -> jax.Array:
    """(3, S, 8W) u8 YCbCr mode32 records -> (3, H2, W) u8 planar RGB
    (any S; final partial block via edge-block masking)."""
    _, s, w8 = records.shape
    w = w8 // 8
    assert w % CHUNK == 0
    halves = 2 if s > 16 else 1
    num_steps = -(-s // (16 * halves))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_dec32_rgb_kernel, num_chunks=w // CHUNK,
                               dtype=dtype, halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((3, 16 * halves, 8 * w), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((3, PANEL * halves, w), lambda p: (0, p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, s * 8, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=6 * s * 8 * w, transcendentals=0),
        interpret=interpret,
    )(records, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(dequant_scales(luma)), _q_big(dequant_scales(chroma)))


def _roundtrip_rgb_kernel(x_ref, b_ref, a_ref, ql_ref, qc_ref,
                          qil_ref, qic_ref, out_ref, *,
                          num_chunks: int, dtype):
    """Fused RGB->YCbCr->DCT->quant->dequant->IDCT->RGB: the coefficient
    records never leave VMEM (3 u8 bytes in + 3 out per pixel)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    q_tiles = (ql_ref[...], qc_ref[...], qc_ref[...])
    qi_tiles = (qil_ref[...], qic_ref[...], qic_ref[...])

    def chunk(c, carry):
        rgb = [x_ref[ch, :, pl.ds(c * CHUNK, CHUNK)]
               .astype(jnp.int32).astype(jnp.float32) for ch in range(3)]
        ycc_out = []
        for ch in range(3):
            m = _RGB2YCC[ch]
            x = (rgb[0] * np.float32(m[0]) + rgb[1] * np.float32(m[1])
                 + rgb[2] * np.float32(m[2])
                 + np.float32(_YCC_BIAS[ch])).astype(dtype)
            y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
                .astype(dtype)
            z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
            v = jnp.clip(jnp.rint(z * q_tiles[ch]).astype(jnp.int32) + 127,
                         0, 255)
            zq = ((v - 127).astype(jnp.float32) * qi_tiles[ch]).astype(dtype)
            y2 = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                .astype(dtype)
            x2 = jax.lax.dot_general(bmat, y2, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ycc_out.append(x2 - np.float32(_YCC_BIAS[ch]))
        for ch in range(3):
            m = _YCC2RGB[ch]
            px = (ycc_out[0] * np.float32(m[0])
                  + ycc_out[1] * np.float32(m[1])
                  + ycc_out[2] * np.float32(m[2]))
            v = jnp.clip(jnp.rint(px), 0.0, 255.0)
            out_ref[ch, :, pl.ds(c * CHUNK, CHUNK)] = \
                v.astype(jnp.int32).astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def _roundtrip_rgb_panels(planes: jax.Array, luma: jax.Array,
                          chroma: jax.Array, *, interpret: bool = False,
                          precision: str = "bf16") -> jax.Array:
    """(3, H2, W) u8 planar RGB -> (3, H2, W) u8: fused YCbCr mode32
    encode->decode round trip (BASELINE config 2/3 workload)."""
    _, h2, w = planes.shape
    assert h2 % 8 == 0 and w % CHUNK == 0
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_roundtrip_rgb_kernel, num_chunks=w // CHUNK,
                               dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(-(-h2 // PANEL),),
        in_specs=[
            pl.BlockSpec((3, PANEL, w), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((3, PANEL, w), lambda p: (0, p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=3 * 4 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=6 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(planes, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(quant_scales(luma)), _q_big(quant_scales(chroma)),
      _q_big(dequant_scales(luma)), _q_big(dequant_scales(chroma)))


# -- public entry points (pad-and-slice coverage for unaligned sizes) ------

def enc32_rgb(top, luma_lut, chroma_lut, rounding="rne",
              interpret=False, precision="bf16"):
    """(3, H2, W) u8 planar RGB top view -> (3, S, 8W) u8 YCbCr mode32
    records; unaligned geometries via the pad-and-slice wrappers."""
    from .pallas_dct import _ceil_to, _pad_view, _slice_records
    _, h2, w = top.shape
    wp = _ceil_to(w, CHUNK)   # H needs no padding: non-dividing grid
    rec = _enc32_rgb_panels(_pad_view(top, h2, wp), jnp.asarray(luma_lut),
                            jnp.asarray(chroma_lut), rounding=rounding,
                            interpret=interpret, precision=precision)
    return _slice_records(rec, h2 // 8, w, 64, h2 // 8, wp)


def dec32_rgb(records, luma_lut, chroma_lut, interpret=False,
              precision="bf16"):
    """(3, S, 8W) u8 YCbCr mode32 records -> (3, H2, W) u8 planar RGB."""
    from .pallas_dct import _ceil_to, _pad_records
    _, s, w8 = records.shape
    w = w8 // 8
    wp = _ceil_to(w, CHUNK)
    rp = _pad_records(records, s, w, 64, s, wp)
    out = _dec32_rgb_panels(rp, jnp.asarray(luma_lut),
                            jnp.asarray(chroma_lut), interpret=interpret,
                            precision=precision)
    return out[:, :, :w] if wp != w else out


def rt32_rgb(top, luma_lut, chroma_lut, interpret=False, precision="bf16"):
    """(3, H2, W) u8 planar RGB top view -> (3, H2, W) u8 fused RGB->RGB
    round trip."""
    from .pallas_dct import _ceil_to, _pad_view
    _, h2, w = top.shape
    wp = _ceil_to(w, CHUNK)
    out = _roundtrip_rgb_panels(_pad_view(top, h2, wp),
                                jnp.asarray(luma_lut),
                                jnp.asarray(chroma_lut),
                                interpret=interpret, precision=precision)
    return out[:, :, :w] if wp != w else out


def encode_quantize32_ycbcr(planes, luma_lut, chroma_lut, rounding="rne",
                            interpret=False, precision="bf16"):
    """(3, H, W) u8 planar RGB (TOP view encoded, dual-view convention)
    -> (3, S*8W) u8 per-channel YCbCr mode32 records."""
    _, h, w = planes.shape
    return enc32_rgb(planes[:, : h // 2, :], luma_lut, chroma_lut,
                     rounding=rounding, interpret=interpret,
                     precision=precision).reshape(3, -1)


def decode_quantize32_ycbcr(data, luma_lut, chroma_lut, size_x, size_y,
                            interpret=False, precision="bf16"):
    """(3, S*8W) u8 records -> (3, H/2, W) u8 planar RGB."""
    records = jnp.asarray(data).reshape(3, (size_y // 2) // 8, 8 * size_x)
    return dec32_rgb(records, luma_lut, chroma_lut, interpret=interpret,
                     precision=precision)


def roundtrip_quantize32_ycbcr(planes, luma_lut, chroma_lut,
                               interpret=False, precision="bf16"):
    """(3, H, W) u8 planar RGB -> (3, H/2, W) u8 fused round trip."""
    _, h, w = planes.shape
    return rt32_rgb(planes[:, : h // 2, :], luma_lut, chroma_lut,
                    interpret=interpret, precision=precision)


# -- portable XLA fallback tier (same math, no Pallas requirement) ---------

@functools.partial(jax.jit, static_argnames=("rounding",))
def encode_ycbcr_xla(planes, luma, chroma, rounding: str = "rne"):
    """(3, H2, W) u8 planar RGB top view -> (3, S, 8W) u8 records; the
    portable composition of the fused kernel's math (f32 YCbCr, no u8
    intermediate, fy-major mode32 records per channel)."""
    from ..core.dct import dct8x8
    from ..core.quantize import quantize_to_u8
    from ..layout import blocks as L_blocks
    from ..layout import reorder as L_reorder
    _, h2, w = planes.shape
    x = planes.astype(jnp.float32)
    ycc = jnp.einsum("ij,jhw->ihw", jnp.asarray(_RGB2YCC), x) \
        + jnp.asarray(_YCC_BIAS, jnp.float32)[:, None, None]
    outs = []
    for ch, lut in ((0, luma), (1, chroma), (2, chroma)):
        blocks = L_blocks.blockize(ycc[ch])          # raw domain (mode32)
        bufs = L_reorder.coeffs_to_buffer(dct8x8(blocks), "fy")
        data = quantize_to_u8(bufs, quant_scales(lut), rounding)
        outs.append(L_reorder.group8(data).reshape(h2 // 8, 8 * w))
    return jnp.stack(outs)


@jax.jit
def decode_ycbcr_xla(records, luma, chroma):
    """(3, S, 8W) u8 records -> (3, H2, W) u8 planar RGB."""
    from ..core.dct import idct8x8
    from ..core.quantize import dequantize_from_u8
    from ..layout import blocks as L_blocks
    from ..layout import reorder as L_reorder
    _, s, w8 = records.shape
    w = w8 // 8
    ycc = []
    for ch, lut in ((0, luma), (1, chroma), (2, chroma)):
        bufs = L_reorder.group8_inverse(records[ch].reshape(-1), w // 8)
        coeffs = L_reorder.buffer_to_coeffs(
            dequantize_from_u8(bufs, dequant_scales(lut)), "fy")
        ycc.append(L_blocks.unblockize(idct8x8(coeffs))
                   - np.float32(_YCC_BIAS[ch]))
    rgb = jnp.einsum("ij,jhw->ihw", jnp.asarray(_YCC2RGB), jnp.stack(ycc))
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)
