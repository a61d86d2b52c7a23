"""Fused YCbCr 4:2:0 chroma-subsampled mode32 Pallas kernels.

North-star extension on top of kernels/color32 (the reference at
/root/reference is grayscale-only, src/simd_dct.h:29-31; color32 added
the 4:4:4 YCbCr fast path).  4:2:0 halves the HBM bytes and the record
stream for the chroma channels — the classic JPEG/video trade — and is
where the TPU formulation gets to shine:

* **The 2x2 chroma downsample is folded into the DCT basis matrices.**
  With ``R`` the (128, 256) pair-averaging matrix (R[i, 2i] =
  R[i, 2i+1] = 1/2), the half-resolution DCT of the averaged tile is

      Z_c = B @ (R @ X @ R^T) @ A = (B @ R) @ X @ (R^T @ A)

  so the fused kernel runs the chroma pass as two MXU matmuls against
  the precomputed (128, 256) / (256, 128) folded bases — the subsample
  costs ZERO extra passes, no strided VPU ops, no intermediate
  half-res plane.  (All entries of ``B @ R`` are exact halvings of
  basis entries, so no extra rounding is introduced either.)
* Decode folds the 2x2 nearest-neighbour upsample the same way:
  ``X_up = R2^T @ (B^T Z A^T) @ R2 = (B @ R2)^T @ Z @ (A^T @ R2)``
  with ``R2`` the (128, 256) replication matrix (entries 1.0).
* Luma rides the unchanged enc32 panel pipeline (two 128-row halves
  per grid step -> aligned 32-sublane record stores); each grid step
  consumes 256 input rows so one chroma panel lines up with two luma
  panels.

Per-pixel HBM traffic: 3 u8 in + 1.5 u8 out (vs color32's 3+3).

Record stream layout (the ``420`` container/API format):
  [ Y records (S, 8W) | Cb records (S/2, 4W) | Cr records (S/2, 4W) ]
where S = H2/8 and each segment is the standard mode32 record stream
of its (possibly half-res) plane.  Total bytes = 1.5 * H2 * W.
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

_CB_BIAS = np.float32(128.0)


def _avg_mat_np() -> np.ndarray:
    """R (128, 256): pair-averaging, R[i, 2i] = R[i, 2i+1] = 0.5."""
    r = np.zeros((128, 256), np.float32)
    idx = np.arange(128)
    r[idx, 2 * idx] = 0.5
    r[idx, 2 * idx + 1] = 0.5
    return r


def _rep_mat_np() -> np.ndarray:
    """R2 (128, 256): pair-replication (nearest-neighbour upsample)."""
    r = np.zeros((128, 256), np.float32)
    idx = np.arange(128)
    r[idx, 2 * idx] = 1.0
    r[idx, 2 * idx + 1] = 1.0
    return r


def _chroma_enc_bases_np():
    """Folded encode bases: Bc = B @ R (128,256), Ac = R^T @ A (256,128).
    Exact in f32 (halvings of basis entries)."""
    b = _row_basis_np().astype(np.float64)
    a = _col_basis_np().astype(np.float64)
    r = _avg_mat_np().astype(np.float64)
    return ((b @ r).astype(np.float32), (r.T @ a).astype(np.float32))


def _chroma_dec_bases_np():
    """Folded decode bases: Bd = B @ R2, Ad = A^T @ R2 (both (128,256));
    X_up = Bd^T @ Z_deq @ Ad."""
    b = _row_basis_np().astype(np.float64)
    a = _col_basis_np().astype(np.float64)
    r2 = _rep_mat_np().astype(np.float64)
    return ((b @ r2).astype(np.float32), (a.T @ r2).astype(np.float32))


def _store_tile(out_ref, tiles, c):
    """Store one or two quantized (128,128) Z tiles as mode32 records at
    chunk ``c`` (the enc32 slicing: per group g, 4 stores of u-band
    halves; two tiles stack into one aligned 32-sublane store)."""
    for g in range(2):
        for k in range(4):
            pieces = [jnp.concatenate(
                [t[(2 * k) * 16:(2 * k + 1) * 16, g * 64:(g + 1) * 64],
                 t[(2 * k + 1) * 16:(2 * k + 2) * 16,
                   g * 64:(g + 1) * 64]], axis=1) for t in tiles]
            piece = (pieces[0] if len(pieces) == 1
                     else jnp.concatenate(pieces, axis=0))
            out_ref[:, pl.ds(c * 1024 + g * 512 + k * 128, 128)] = piece


def _gather_tile(ref, h, c):
    """Reassemble a (128,128) quantized Z tile from mode32 records
    (inverse of _store_tile; see pallas_dct._dec32_kernel)."""
    bands = []
    for k in range(4):
        g0 = ref[pl.ds(h * 16, 16), pl.ds(c * 1024 + k * 128, 128)]
        g1 = ref[pl.ds(h * 16, 16), pl.ds(c * 1024 + 512 + k * 128, 128)]
        bands.append(jnp.concatenate([g0[:, :64], g1[:, :64]], axis=1))
        bands.append(jnp.concatenate([g0[:, 64:], g1[:, 64:]], axis=1))
    return jnp.concatenate(bands, axis=0)        # (128, 128) u8


def _gather_tiles2(ref, c):
    """Both record panels' (128,128) Z tiles at chunk ``c`` from ALIGNED
    (32,128) reads (16-sublane sub-tile reads pay ~2x masking)."""
    gs = [(ref[pl.ds(0, 32), pl.ds(c * 1024 + k * 128, 128)],
           ref[pl.ds(0, 32), pl.ds(c * 1024 + 512 + k * 128, 128)])
          for k in range(4)]
    out = []
    for h in range(2):
        bands = []
        for g0f, g1f in gs:
            g0 = g0f[h * 16: h * 16 + 16, :]
            g1 = g1f[h * 16: h * 16 + 16, :]
            bands.append(jnp.concatenate([g0[:, :64], g1[:, :64]], axis=1))
            bands.append(jnp.concatenate([g0[:, 64:], g1[:, 64:]], axis=1))
        out.append(jnp.concatenate(bands, axis=0))
    return out                                   # [h0, h1] (128, 128) u8


def _enc420_kernel(x_ref, b_ref, a_ref, bc_ref, ac_ref, ql_ref, qc_ref,
                   y_ref, cb_ref, cr_ref, *, rounding: str, num_chunks: int,
                   dtype):
    """x_ref (3, 256, W) planar RGB -> y_ref (32, 8W) luma records +
    cb_ref/cr_ref (16, 4W) half-res chroma records.

    One loop over 256-column regions: the RGB block converts u8 -> f32
    ONCE and feeds both the full-res luma tiles and the folded-basis
    chroma pass (a separate luma/chroma loop re-converted the region
    and measured ~25% slower end-to-end)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    bc = bc_ref[...]          # (128, 256) folded row basis
    ac = ac_ref[...]          # (256, 128) folded col basis
    ql = ql_ref[...]
    qc = qc_ref[...]
    my = _RGB2YCC[0]

    def region(cc, carry):
        # per 128-row half: one u8->f32 conversion feeds the luma mix,
        # both chroma mixes, and the chroma row stage; every operand
        # stays (128, 256) with lane-granular slicing only ((256, *)
        # values forced Mosaic relayouts — measured slower)
        ytiles = [[], []]                   # [j][h]
        cys = {1: [], 2: []}                # chroma row-stage halves
        for h in range(2):
            rgbh = [x_ref[ch, pl.ds(h * PANEL, PANEL),
                          pl.ds(cc * 2 * CHUNK, 2 * CHUNK)]
                    .astype(jnp.int32).astype(jnp.float32)
                    for ch in range(3)]
            xyh = (rgbh[0] * np.float32(my[0]) + rgbh[1] * np.float32(my[1])
                   + rgbh[2] * np.float32(my[2])).astype(dtype)
            for j in range(2):
                xt = xyh[:, j * CHUNK:(j + 1) * CHUNK]
                y = jnp.dot(xt, amat, preferred_element_type=jnp.float32) \
                    .astype(dtype)
                z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
                ytiles[j].append(_quantize_tile(z * ql, rounding))
            for ch in (1, 2):
                m = _RGB2YCC[ch]
                xc = (rgbh[0] * np.float32(m[0])
                      + rgbh[1] * np.float32(m[1])
                      + rgbh[2] * np.float32(m[2]) + _CB_BIAS).astype(dtype)
                cys[ch].append(jnp.dot(
                    xc, ac, preferred_element_type=jnp.float32)
                    .astype(dtype))                      # (128, 128)
        for j in range(2):
            _store_tile(y_ref, ytiles[j], 2 * cc + j)
        # chroma column stage: z = Bc[:, :128] @ y0 + Bc[:, 128:] @ y1
        for ch, out_ref in ((1, cb_ref), (2, cr_ref)):
            z = (jnp.dot(bc[:, :PANEL], cys[ch][0],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(bc[:, PANEL:], cys[ch][1],
                           preferred_element_type=jnp.float32))
            _store_tile(out_ref, [_quantize_tile(z * qc, rounding)], cc)
        return carry

    jax.lax.fori_loop(0, num_chunks // 2, region, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("rounding", "interpret",
                                             "precision"))
def _enc420_panels(planes: jax.Array, luma: jax.Array, chroma: jax.Array,
                   *, rounding: str = "rne", interpret: bool = False,
                   precision: str = "bf16"):
    """(3, H2, W) u8 planar RGB -> ((S, 8W) luma records,
    (2, S/2, 4W) chroma records).  Requires W % 256 == 0 and
    H2 % 16 == 0; any such H2 works (non-dividing grid + edge-block
    masking; both the luma strip bases and the folded chroma bases are
    block-diagonal per 8/16 input rows, so pad rows never contaminate
    real strips)."""
    _, h2, w = planes.shape
    assert h2 % 16 == 0 and w % (2 * CHUNK) == 0
    num_steps = -(-h2 // 256)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_enc420_kernel, rounding=rounding,
                               num_chunks=w // CHUNK, dtype=dtype)
    bc, ac = _chroma_enc_bases_np()
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((3, 256, w), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 256), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((32, 8 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    y_rec, cb_rec, cr_rec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
            jax.ShapeDtypeStruct((h2 // 16, 4 * w), jnp.uint8),
            jax.ShapeDtypeStruct((h2 // 16, 4 * w), jnp.uint8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * 128 * 128 * w * 2 * num_steps,
            bytes_accessed=(3 * h2 * w) + (3 * h2 * w) // 2,
            transcendentals=0),
        interpret=interpret,
    )(planes, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      jnp.asarray(bc).astype(dtype), jnp.asarray(ac).astype(dtype),
      _q_big(quant_scales(luma)), _q_big(quant_scales(chroma)))
    return y_rec, jnp.stack([cb_rec, cr_rec])


def _dec420_kernel(y_ref, cb_ref, cr_ref, b_ref, a_ref, bd_ref, ad_ref,
                   qil_ref, qic_ref, out_ref, *, num_chunks: int, dtype):
    """y_ref (32, 8W) + cb_ref/cr_ref (16, 4W) -> out_ref (3, 256, W)
    planar RGB: per-channel IDCT (chroma through the folded replication
    bases) then the inverse BT.601 mix, all in-kernel."""
    bmat = b_ref[...]
    amat = a_ref[...]
    bd = bd_ref[...]          # (128, 256)
    ad = ad_ref[...]          # (128, 256)
    qil = qil_ref[...]
    qic = qic_ref[...]

    def cchunk(cc, carry):
        # chroma row stage: one record tile -> y = Z_deq @ Ad (128, 256)
        # per channel (columns already upsampled by the folded Ad)
        cys = []
        for ref in (cb_ref, cr_ref):
            zb = _gather_tile(ref, 0, cc)
            zq = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                  * qic).astype(dtype)
            cys.append(jnp.dot(zq, ad, preferred_element_type=jnp.float32)
                       .astype(dtype))                      # (128, 256)
        # per 128-row half: every operand stays (128, 256) — the row
        # upsample takes the matching 128-column slice of Bd, so no
        # (256, 256) value is ever built (Mosaic relayouts; the same
        # restructure took the encode from 137.8 to 85.9 us)
        ytiles = [_gather_tiles2(y_ref, 2 * cc + j) for j in range(2)]
        for h in range(2):
            cols = []
            for j in range(2):
                zb = ytiles[j][h]
                zq = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                      * qil).astype(dtype)
                y = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) \
                    .astype(dtype)
                cols.append(jax.lax.dot_general(
                    bmat, y, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            ylum = jnp.concatenate(cols, axis=1)            # (128, 256)
            ycc = [jax.lax.dot_general(
                bd[:, h * 128:(h + 1) * 128], cy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) - _CB_BIAS
                for cy in cys]                              # (128, 256)
            for ch in range(3):
                m = _YCC2RGB[ch]
                px = (ylum * np.float32(m[0]) + ycc[0] * np.float32(m[1])
                      + ycc[1] * np.float32(m[2]))
                v = jnp.clip(jnp.rint(px), 0.0, 255.0)
                out_ref[ch, h * 128:(h + 1) * 128,
                        pl.ds(cc * 2 * CHUNK, 2 * CHUNK)] = \
                    v.astype(jnp.int32).astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks // 2, cchunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def _dec420_panels(y_rec: jax.Array, c_rec: jax.Array, luma: jax.Array,
                   chroma: jax.Array, *, interpret: bool = False,
                   precision: str = "bf16") -> jax.Array:
    """((S, 8W), (2, S/2, 4W)) u8 420 records -> (3, H2, W) u8 planar
    RGB (chroma upsampled by 2x2 replication inside the kernel)."""
    s, w8 = y_rec.shape
    w = w8 // 8
    assert w % (2 * CHUNK) == 0 and s % 2 == 0
    num_steps = -(-s // 32)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_dec420_kernel, num_chunks=w // CHUNK,
                               dtype=dtype)
    bd, ad = _chroma_dec_bases_np()
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((32, 8 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 256), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 256), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 256, w), lambda p: (0, p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, s * 8, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * 128 * 128 * w * 2 * num_steps,
            bytes_accessed=(3 * s * 8 * w) + (3 * s * 8 * w) // 2,
            transcendentals=0),
        interpret=interpret,
    )(y_rec, c_rec[0], c_rec[1],
      jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      jnp.asarray(bd).astype(dtype), jnp.asarray(ad).astype(dtype),
      _q_big(dequant_scales(luma)), _q_big(dequant_scales(chroma)))


# -- pad-and-slice coverage wrappers (W % 128 == 0 contract) ---------------

def enc420_rgb(top, luma_lut, chroma_lut, rounding="rne",
               interpret=False, precision="bf16"):
    """(3, H2, W) u8 planar RGB top view -> ((S, 8W), (2, S/2, 4W)) u8
    420 records; W % 128 != 256-multiple geometries via pad-and-slice
    (pad columns only reach pad-only chroma blocks, which are sliced
    away)."""
    from .pallas_dct import _ceil_to, _pad_view, _slice_records
    _, h2, w = top.shape
    wp = _ceil_to(w, 2 * CHUNK)
    padded = jnp.stack([_pad_view(top[ch], h2, wp) for ch in range(3)]) \
        if wp != w else top
    y_rec, c_rec = _enc420_panels(padded, jnp.asarray(luma_lut),
                                  jnp.asarray(chroma_lut),
                                  rounding=rounding, interpret=interpret,
                                  precision=precision)
    if wp != w:
        y_rec = _slice_records(y_rec, h2 // 8, w, 64, h2 // 8, wp)
        c_rec = jax.vmap(lambda r: _slice_records(
            r, h2 // 16, w // 2, 64, h2 // 16, wp // 2))(c_rec)
    return y_rec, c_rec


def dec420_rgb(y_rec, c_rec, luma_lut, chroma_lut, interpret=False,
               precision="bf16"):
    """((S, 8W), (2, S/2, 4W)) u8 420 records -> (3, H2, W) u8 RGB."""
    from .pallas_dct import _ceil_to, _pad_records
    s, w8 = y_rec.shape
    w = w8 // 8
    wp = _ceil_to(w, 2 * CHUNK)
    if wp != w:
        y_rec = _pad_records(y_rec, s, w, 64, s, wp)
        c_rec = jnp.stack([_pad_records(c_rec[i], s // 2, w // 2, 64,
                                        s // 2, wp // 2)
                           for i in range(2)])
    out = _dec420_panels(y_rec, c_rec, jnp.asarray(luma_lut),
                         jnp.asarray(chroma_lut), interpret=interpret,
                         precision=precision)
    return out[:, :, :w] if wp != w else out


# -- portable XLA fallback tier ---------------------------------------------

@functools.partial(jax.jit, static_argnames=("rounding",))
def encode_ycbcr420_xla(planes, luma, chroma, rounding: str = "rne"):
    """(3, H2, W) u8 planar RGB top view -> ((S, 8W), (2, S/2, 4W)) u8
    420 records: the portable composition of the fused kernel's math
    (f32 YCbCr mix, 2x2 mean chroma pool, per-plane fy-major mode32)."""
    from ..core.dct import dct8x8
    from ..core.quantize import quantize_to_u8
    from ..layout import blocks as L_blocks
    from ..layout import reorder as L_reorder
    _, h2, w = planes.shape
    x = planes.astype(jnp.float32)
    ycc = jnp.einsum("ij,jhw->ihw", jnp.asarray(_RGB2YCC), x) \
        + jnp.asarray([0.0, 128.0, 128.0], jnp.float32)[:, None, None]

    def plane_records(p, lut, ww):
        blocks = L_blocks.blockize(p)                 # raw-domain (mode32)
        bufs = L_reorder.coeffs_to_buffer(dct8x8(blocks), "fy")
        data = quantize_to_u8(bufs, quant_scales(lut), rounding)
        return L_reorder.group8(data).reshape(-1, 8 * ww)

    y_rec = plane_records(ycc[0], luma, w)
    half = ycc[1:].reshape(2, h2 // 2, 2, w // 2, 2).mean(axis=(2, 4))
    c_rec = jnp.stack([plane_records(half[i], chroma, w // 2)
                       for i in range(2)])
    return y_rec, c_rec


@jax.jit
def decode_ycbcr420_xla(y_rec, c_rec, luma, chroma):
    """((S, 8W), (2, S/2, 4W)) u8 420 records -> (3, H2, W) u8 RGB
    (2x2 replication chroma upsample, matching the fused kernel)."""
    from ..core.dct import idct8x8
    from ..core.quantize import dequantize_from_u8
    from ..layout import blocks as L_blocks
    from ..layout import reorder as L_reorder
    s, w8 = y_rec.shape
    w = w8 // 8

    def plane(rec, lut, ww):
        bufs = L_reorder.group8_inverse(rec.reshape(-1), ww // 8)
        coeffs = L_reorder.buffer_to_coeffs(
            dequantize_from_u8(bufs, dequant_scales(lut)), "fy")
        return L_blocks.unblockize(idct8x8(coeffs))

    ylum = plane(y_rec, luma, w)
    half = jnp.stack([plane(c_rec[i], chroma, w // 2) for i in range(2)])
    up = jnp.repeat(jnp.repeat(half, 2, axis=1), 2, axis=2) \
        - _CB_BIAS
    ycc = jnp.stack([ylum, up[0], up[1]])
    rgb = jnp.einsum("ij,jhw->ihw", jnp.asarray(_YCC2RGB), ycc)
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)


# -- flat-stream helpers (API/container format) -----------------------------

def pack_records(y_rec, c_rec):
    """((S, 8W), (2, S/2, 4W)) -> flat (1.5*H2*W,) u8 stream
    [Y | Cb | Cr]."""
    return jnp.concatenate([y_rec.reshape(-1), c_rec[0].reshape(-1),
                            c_rec[1].reshape(-1)])


def unpack_records(data, size_x: int, h2: int):
    """Flat 420 stream -> ((S, 8W), (2, S/2, 4W)) u8 views."""
    n_y = h2 * size_x
    n_c = n_y // 4
    y_rec = data[:n_y].reshape(h2 // 8, 8 * size_x)
    c_rec = data[n_y:].reshape(2, h2 // 16, 4 * size_x)
    return y_rec, c_rec
