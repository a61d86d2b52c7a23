"""Fixed-point s8 DCT bases on the MXU: can the encode matmuls run at
int8 rate (2x bf16 on v5e, proven for the Pi permutation in
exp_r7_pi_s8.py) without breaking the +-1-byte contract?

Scheme (encode, mode32 semantics):
  * pixels: u8 XOR 0x80 bitcast s8  ==  x - 128 exactly.  The -128 shift
    only moves the DC coefficient; DCT is linear, so a constant tile
    C0 = q .* DCT2D(128*ones) added before the final rint corrects it
    exactly.
  * bases: A8 = round(A * 2^8), B8 = round(B * 2^8) — max |D entry| is
    0.4904 so round(0.4904*256)=126 fits s8.  Basis rounding error is
    ~0.29/256 per entry (~0.24 px rms per pass on u8-scale data).
  * pass 1: Y32 = xs @ A8, exact s32 accumulate.
  * intermediate requant: y8 = rint(Y32 * cY) with cY = 127/max|Y32|
    (the bound computed from the integer basis itself), error std
    ~0.29*step where step = 1/(2^8 cY) ~ 2.9 px.
  * pass 2: Z32 = B8 @ y8, exact s32; quantize with
    qeff = q / (2^16 * cY) and the C0 DC-correction tile.

The decode direction CANNOT ride s8: zq = (v-127) .* qi needs the
non-separable dequant LUT applied elementwise BEFORE the matmuls, and
quantizing (qi .* S) to s8 costs ~20 px rms (worked through in round 4
notes) — so the fused round trip keeps its IDCT half in bf16 and the
expected win is ~the encode half of the MXU wall.

Measures (paired adjacent cycles, slope methodology):
  1. enc32 shipping bf16 vs s8 variant — wall + record byte deltas
  2. roundtrip shipping bf16 vs s8-encode variant — wall + PSNR deltas
     (vs the f32 XLA ground truth)

Run: python experiments/exp_r8_s8dct.py
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simd_dct_tpu.kernels.pallas_dct import (
    PANEL, CHUNK, _enc32_panels, _roundtrip_panels, _q_big)
from simd_dct_tpu.kernels.panel import row_basis_np, col_basis_np
from simd_dct_tpu.core.quantize import (
    default_quant_lut, quant_scales, dequant_scales)

H2, W = 2048, 3840


# -- s8 constant construction -------------------------------------------

@functools.lru_cache(maxsize=None)
def s8_consts():
    a = col_basis_np()
    b = row_basis_np()
    a8 = np.clip(np.rint(a * 256.0), -127, 127).astype(np.int8)
    b8 = np.clip(np.rint(b * 256.0), -127, 127).astype(np.int8)
    # exact bound on |Y32| = |(x-128) @ A8| for u8 x: per column,
    # 128 * sum|A8| (the worst signed input pattern)
    ymax = 128.0 * np.abs(a8.astype(np.int64)).sum(axis=0).max()
    cy = np.float32(126.49 / ymax)
    return a8, b8, cy


def dc_tile_np() -> np.ndarray:
    """DCT2D(128*ones) in the permuted Z-tile layout: B @ (128) @ A."""
    a = col_basis_np().astype(np.float64)
    b = row_basis_np().astype(np.float64)
    x = np.full((128, 128), 128.0)
    return (b @ x @ a).astype(np.float32)


def qeff_and_c0(scales):
    _, _, cy = s8_consts()
    q_big = _q_big(scales)                      # jit-traceable in scales
    qeff = q_big * np.float32(1.0 / (65536.0 * cy))
    c0 = q_big * jnp.asarray(dc_tile_np())
    return qeff, c0


# -- s8 enc32 kernel ------------------------------------------------------

def _enc32_s8_kernel(x_ref, b_ref, a_ref, q_ref, c0_ref, out_ref, *,
                     num_chunks: int, halves: int, cy: float):
    b8 = b_ref[...]
    a8 = a_ref[...]
    qeff = q_ref[...]
    c0 = c0_ref[...]

    def compute_tile(h, c):
        xs = pltpu.bitcast(
            x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
            ^ jnp.uint8(0x80), jnp.int8)
        y32 = jax.lax.dot_general(xs, a8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y8 = jnp.rint(y32.astype(jnp.float32) * jnp.float32(cy)) \
            .astype(jnp.int32).astype(jnp.int8)
        z32 = jax.lax.dot_general(b8, y8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        v = jnp.rint(z32.astype(jnp.float32) * qeff + c0) \
            .astype(jnp.int32) + 127
        return jnp.clip(v, 0, 255).astype(jnp.uint8)

    def chunk(c, carry):
        tiles = [compute_tile(h, c) for h in range(halves)]
        for g in range(2):
            for k in range(4):
                pieces = [jnp.concatenate(
                    [t[(2 * k) * 16:(2 * k + 1) * 16, g * 64:(g + 1) * 64],
                     t[(2 * k + 1) * 16:(2 * k + 2) * 16,
                       g * 64:(g + 1) * 64]], axis=1) for t in tiles]
                piece = (pieces[0] if halves == 1
                         else jnp.concatenate(pieces, axis=0))
                out_ref[:, pl.ds(c * 1024 + g * 512 + k * 128, 128)] = piece
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@jax.jit
def enc32_s8(view, scales):
    h2, w = view.shape
    a8, b8, cy = s8_consts()
    qeff, c0 = qeff_and_c0(scales)
    halves = 4 if h2 % (PANEL * 4) == 0 else (2 if h2 > PANEL else 1)
    num_steps = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_enc32_s8_kernel, num_chunks=w // CHUNK,
                               halves=halves, cy=float(cy))
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(b8), jnp.asarray(a8), qeff, c0)


# -- s8-encode round-trip kernel ------------------------------------------

# -- variant A: pass-1-only s8 (no intermediate requant chain) -------------
#
# xs @ A8 accumulates exactly in s32; the i32 -> bf16 convert replaces the
# bf16 path's u8 -> i32 -> f32 -> bf16 chain (one op fewer) and the 2^-8
# basis scale folds into qeff.  Pass 2 stays bf16.  Strictly removes work
# vs the bf16 path IF the s8 matmul is not slower.

def _enc32_s8a_kernel(x_ref, b_ref, a8_ref, q_ref, c0_ref, out_ref, *,
                      num_chunks: int, halves: int, dtype):
    bmat = b_ref[...]
    a8 = a8_ref[...]
    qeff = q_ref[...]
    c0 = c0_ref[...]

    def compute_tile(h, c):
        xs = pltpu.bitcast(
            x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
            ^ jnp.uint8(0x80), jnp.int8)
        y32 = jax.lax.dot_general(xs, a8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = y32.astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        v = jnp.rint(z * qeff + c0).astype(jnp.int32) + 127
        return jnp.clip(v, 0, 255).astype(jnp.uint8)

    def chunk(c, carry):
        tiles = [compute_tile(h, c) for h in range(halves)]
        for g in range(2):
            for k in range(4):
                pieces = [jnp.concatenate(
                    [t[(2 * k) * 16:(2 * k + 1) * 16, g * 64:(g + 1) * 64],
                     t[(2 * k + 1) * 16:(2 * k + 2) * 16,
                       g * 64:(g + 1) * 64]], axis=1) for t in tiles]
                piece = (pieces[0] if halves == 1
                         else jnp.concatenate(pieces, axis=0))
                out_ref[:, pl.ds(c * 1024 + g * 512 + k * 128, 128)] = piece
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@jax.jit
def enc32_s8a(view, scales):
    h2, w = view.shape
    a8, _, _ = s8_consts()
    q_big = _q_big(scales)
    qeff = q_big * np.float32(1.0 / 256.0)
    c0 = q_big * jnp.asarray(dc_tile_np())
    halves = 4 if h2 % (PANEL * 4) == 0 else (2 if h2 > PANEL else 1)
    num_steps = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_enc32_s8a_kernel, num_chunks=w // CHUNK,
                               halves=halves, dtype=jnp.bfloat16)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(row_basis_np()).astype(jnp.bfloat16),
      jnp.asarray(a8), qeff, c0)


def _rt_s8_kernel(x_ref, b8_ref, a8_ref, q_ref, c0_ref, b_ref, a_ref,
                  qi_ref, out_ref, *, num_chunks: int, cy: float):
    b8 = b8_ref[...]
    a8 = a8_ref[...]
    qeff = q_ref[...]
    c0 = c0_ref[...]
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]

    def chunk(c, carry):
        xs = pltpu.bitcast(
            x_ref[:, pl.ds(c * CHUNK, CHUNK)] ^ jnp.uint8(0x80), jnp.int8)
        y32 = jax.lax.dot_general(xs, a8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y8 = jnp.rint(y32.astype(jnp.float32) * jnp.float32(cy)) \
            .astype(jnp.int32).astype(jnp.int8)
        z32 = jax.lax.dot_general(b8, y8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        n = jnp.clip(jnp.rint(z32.astype(jnp.float32) * qeff + c0)
                     .astype(jnp.int32), -127, 128)
        zq = (n.astype(jnp.float32) * qi_big).astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)
        x2 = jax.lax.dot_general(bmat, y2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        px = jnp.clip(jnp.rint(x2), 0.0, 255.0)
        out_ref[:, pl.ds(c * CHUNK, CHUNK)] = px.astype(jnp.int32) \
            .astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@jax.jit
def roundtrip_s8(view, lut):
    h2, w = view.shape
    a8, b8, cy = s8_consts()
    scales = quant_scales(lut)
    qeff, c0 = qeff_and_c0(scales)
    dtype = jnp.bfloat16
    kernel = functools.partial(_rt_s8_kernel, num_chunks=w // CHUNK,
                               cy=float(cy))
    grid_spec = pl.GridSpec(
        grid=(-(-h2 // PANEL),),
        in_specs=[
            pl.BlockSpec((PANEL, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((PANEL, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(b8), jnp.asarray(a8), qeff, c0,
      jnp.asarray(row_basis_np()).astype(dtype),
      jnp.asarray(col_basis_np()).astype(dtype),
      _q_big(dequant_scales(lut)))


def _rt_s8a_kernel(x_ref, a8_ref, q_ref, c0_ref, b_ref, a_ref,
                   qi_ref, out_ref, *, num_chunks: int):
    a8 = a8_ref[...]
    qeff = q_ref[...]
    c0 = c0_ref[...]
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]

    def chunk(c, carry):
        xs = pltpu.bitcast(
            x_ref[:, pl.ds(c * CHUNK, CHUNK)] ^ jnp.uint8(0x80), jnp.int8)
        y32 = jax.lax.dot_general(xs, a8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        z = jnp.dot(bmat, y32.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        n = jnp.clip(jnp.rint(z * qeff + c0).astype(jnp.int32), -127, 128)
        zq = (n.astype(jnp.float32) * qi_big).astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)
        x2 = jax.lax.dot_general(bmat, y2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        px = jnp.clip(jnp.rint(x2), 0.0, 255.0)
        out_ref[:, pl.ds(c * CHUNK, CHUNK)] = px.astype(jnp.int32) \
            .astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@jax.jit
def roundtrip_s8a(view, lut):
    h2, w = view.shape
    a8, _, _ = s8_consts()
    scales = quant_scales(lut)
    q_big = _q_big(scales)
    qeff = q_big * np.float32(1.0 / 256.0)
    c0 = q_big * jnp.asarray(dc_tile_np())
    dtype = jnp.bfloat16
    kernel = functools.partial(_rt_s8a_kernel, num_chunks=w // CHUNK)
    grid_spec = pl.GridSpec(
        grid=(-(-h2 // PANEL),),
        in_specs=[
            pl.BlockSpec((PANEL, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((PANEL, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(a8), qeff, c0,
      jnp.asarray(row_basis_np()).astype(dtype),
      jnp.asarray(col_basis_np()).astype(dtype),
      _q_big(dequant_scales(lut)))


# -- lean bf16 round trip: VPU-op reduction, byte-exact vs shipping --------
#
# exp_r8_mxu_rate.py shows s8 and bf16 dots run at the SAME MXU rate on
# this chip, so the round-trip lever is VPU work, not int8.  The
# shipping kernel's quantize does rint -> i32 -> +127 -> clip(0,255)
# -> -127 -> f32; but clip(rint(x)+127, 0, 255) - 127 == clip(rint(x),
# -127, 128) EXACTLY, and rint's integer-valued f32 output needs no
# i32 round trip before the dequant multiply — saves ~4 elementwise
# tile-ops per chunk with bit-identical outputs.

def _rt_lean_kernel(x_ref, b_ref, a_ref, q_ref, qi_ref, out_ref, *,
                    num_chunks: int, hpanels: int = 1):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    qi_big = qi_ref[...]

    def tile(h, c):
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32).astype(jnp.float32)).astype(jnp.bfloat16)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        n = jnp.clip(jnp.rint(z * q_big), -127.0, 128.0)
        zq = (n * qi_big).astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)
        x2 = jax.lax.dot_general(bmat, y2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        px = jnp.clip(jnp.rint(x2), 0.0, 255.0)
        out_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)] = \
            px.astype(jnp.int32).astype(jnp.uint8)

    def chunk(c, carry):
        for h in range(hpanels):
            tile(h, c)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("rows",))
def roundtrip_lean(view, lut, rows=PANEL):
    h2, w = view.shape
    dtype = jnp.bfloat16
    kernel = functools.partial(_rt_lean_kernel, num_chunks=w // CHUNK,
                               hpanels=rows // PANEL)
    grid_spec = pl.GridSpec(
        grid=(-(-h2 // rows),),
        in_specs=[
            pl.BlockSpec((rows, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((rows, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(row_basis_np()).astype(dtype),
      jnp.asarray(col_basis_np()).astype(dtype),
      _q_big(quant_scales(lut)), _q_big(dequant_scales(lut)))


# -- harness ---------------------------------------------------------------

def paired_walls(fns, batches, cycles=5, reps=8):
    """fns: {name: jitted checksum fn}; returns per-frame us medians."""
    for f in fns.values():
        for _, xb in batches:
            float(f(xb))
    cyc = {m: [] for m in fns}
    for _ in range(cycles):
        best = {}
        for _ in range(reps):
            for m, f in fns.items():
                for bsz, xb in batches:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(m, bsz)] = min(best.get((m, bsz), 1e9),
                                         time.perf_counter() - t0)
        (b0, _), (b1, _) = batches
        for m in fns:
            cyc[m].append((best[(m, b1)] - best[(m, b0)]) / (b1 - b0) * 1e6)
    return {m: statistics.median([v for v in vs if v > 0] or [float("nan")])
            for m, vs in cyc.items()}, cyc


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(d * d)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)
    rng = np.random.default_rng(7)
    # smooth content (the realistic case) + noise (worst case)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H2))
    smooth = ((128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
               + 20 * np.sin((xx + 2 * yy) / 11.0))
              .clip(0, 255).astype(np.uint8))
    noise = rng.integers(0, 256, (H2, W), dtype=np.uint8)

    print("== correctness ==", flush=True)
    for name, img in (("smooth", smooth), ("noise", noise)):
        x = jnp.asarray(img)
        r_bf = np.asarray(_enc32_panels(x, scales, normalize=False,
                                        rounding="rne", precision="bf16"))
        r_f32 = np.asarray(_enc32_panels(x, scales, normalize=False,
                                         rounding="rne", precision="f32"))
        r_s8 = np.asarray(enc32_s8(x, scales))
        r_s8a = np.asarray(enc32_s8a(x, scales))
        d = r_s8.astype(np.int16) - r_f32.astype(np.int16)
        da = r_s8a.astype(np.int16) - r_f32.astype(np.int16)
        d_bf = r_bf.astype(np.int16) - r_f32.astype(np.int16)
        print(f"enc32 {name}: s8-vs-f32 max|d|={np.abs(d).max()} "
              f"flips={np.mean(d != 0):.4f} | s8a-vs-f32 "
              f"max|d|={np.abs(da).max()} flips={np.mean(da != 0):.4f} "
              f"| bf16-vs-f32 "
              f"max|d|={np.abs(d_bf).max()} flips={np.mean(d_bf != 0):.4f}",
              flush=True)

        rt_bf = np.asarray(_roundtrip_panels(x, lut, normalize=False))
        rt_lean = np.asarray(roundtrip_lean(x, lut))
        print(f"rt    {name}: lean == shipping byte-exact: "
              f"{np.array_equal(rt_lean, rt_bf)}", flush=True)
        rt_s8 = np.asarray(roundtrip_s8(x, lut))
        rt_s8a = np.asarray(roundtrip_s8a(x, lut))
        p_bf = psnr(rt_bf, img)
        p_s8 = psnr(rt_s8, img)
        p_s8a = psnr(rt_s8a, img)
        dd = rt_s8.astype(np.int16) - rt_bf.astype(np.int16)
        print(f"rt    {name}: PSNR bf16={p_bf:.2f} s8={p_s8:.2f} "
              f"(delta {p_s8 - p_bf:+.2f} dB) s8a={p_s8a:.2f} "
              f"(delta {p_s8a - p_bf:+.2f} dB); s8-vs-bf16 px "
              f"max|d|={np.abs(dd).max()} flips={np.mean(dd != 0):.4f}",
              flush=True)

    print("== walls (paired cycles) ==", flush=True)

    def batches(sizes=(8, 136)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b, H2, W), 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    bs = batches()

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    fns = {
        "enc32_bf16": csum(lambda v: _enc32_panels(
            v, scales, normalize=False, rounding="rne", precision="bf16")),
        "enc32_s8": csum(lambda v: enc32_s8(v, scales)),
        "enc32_s8a": csum(lambda v: enc32_s8a(v, scales)),
        "rt_bf16": csum(lambda v: _roundtrip_panels(v, lut,
                                                    normalize=False)),
        "rt_lean": csum(lambda v: roundtrip_lean(v, lut)),
        "rt_lean256": csum(lambda v: roundtrip_lean(v, lut, rows=256)),
        "rt_lean512": csum(lambda v: roundtrip_lean(v, lut, rows=512)),
        "rt_s8": csum(lambda v: roundtrip_s8(v, lut)),
        "rt_s8a": csum(lambda v: roundtrip_s8a(v, lut)),
    }
    med, cyc = paired_walls(fns, bs)
    for m, v in med.items():
        print(f"{m}: {v:.1f} us/4K  cycles="
              f"{[round(x, 1) for x in cyc[m]]}", flush=True)
    print(f"rt speedup: lean {med['rt_bf16'] / med['rt_lean']:.3f}x "
          f"s8 {med['rt_bf16'] / med['rt_s8']:.3f}x "
          f"s8a {med['rt_bf16'] / med['rt_s8a']:.3f}x; "
          f"enc32 speedup: s8 {med['enc32_bf16'] / med['enc32_s8']:.3f}x "
          f"s8a {med['enc32_bf16'] / med['enc32_s8a']:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
