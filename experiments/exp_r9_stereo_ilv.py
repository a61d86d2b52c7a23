"""Stereo materialized-interleave attempt #3 (round-3 VERDICT next #5).

The reference stereo stream orders bytes (plane, strip, view, b) — as a
2-D array that is (64, 2S, BW) with rows alternating view0/view1 strips.
Previous attempts interleaved on the LANE axis (view-1 store offsets of
BW=480 lanes are unaligned -> masked stores, 2x worse) or via XLA
transpose outside (~70 us epilogue).  This probe interleaves on the
SUBLANE axis instead: both views' (16h, L) plane pieces are computed in
the SAME grid step and zipped with a stack+reshape — if Mosaic lowers
that as sublane shuffles, every store is a full-width (32h, L) aligned
store and the reference stream falls out as a pure reshape with NO
epilogue.

Run: python experiments/exp_r9_stereo_ilv.py
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

import simd_dct_tpu.kernels.pallas_dct as PK
from simd_dct_tpu.kernels.pallas_dct import PANEL, CHUNK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

H, W = 4096, 3840


def _zipmat_np(halves: int) -> np.ndarray:
    """(32h, 32h) 0/1 sublane-zip: row 2i+view <- stacked row
    view*16h + i (the strip interleave as a constant s8 matmul —
    jnp.repeat/stack/reshape formulations all crash the Mosaic remote
    compiler when composed with the DCT pipeline; the MXU form lowers
    and each output byte is one input byte mod 256, so s8/s32/&255 is
    exact, same argument as the Pi matmul)."""
    n = 32 * halves
    p = np.zeros((n, n), np.int8)
    for view in range(2):
        for i in range(16 * halves):
            p[2 * i + view, view * 16 * halves + i] = 1
    return p


def _enc_stereo_ilv_kernel(xl_ref, xr_ref, b_ref, a_ref, q_ref, z_ref,
                           out_ref, *, rounding, groups, dtype,
                           halves: int):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    zp = z_ref[...]

    def compute_tile(x_ref, h, c):
        x = (x_ref[0, pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32)
             .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        return PK._quantize_tile(z * q_big, rounding)

    for base, size in groups:
        tiles = {v: [[compute_tile(x_ref, h, base + i)
                      for i in range(size)] for h in range(halves)]
                 for v, x_ref in ((0, xl_ref), (1, xr_ref))}
        for u in range(8):
            for v in range(8):
                per_view = []
                for view in range(2):
                    rows = [jnp.concatenate(
                        [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                         for t in tiles[view][h]], axis=1)
                        for h in range(halves)]        # (16, 16*size) each
                    per_view.append(rows[0] if halves == 1
                                    else jnp.concatenate(rows, axis=0))
                # sublane zip: out row 2s = view0 strip s, 2s+1 = view1
                stacked = pltpu.bitcast(
                    jnp.concatenate(per_view, axis=0), jnp.int8)
                piece = (jax.lax.dot_general(
                    zp, stacked, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                    & 255).astype(jnp.uint8)
                out_ref[u * 8 + v, :, pl.ds(base * 16, 16 * size)] = piece


@functools.partial(jax.jit, static_argnames=("rounding", "halves"))
def enc_stereo_ilv(img, scales, rounding="rne", halves=2):
    h, w = img.shape
    h2 = h // 2
    bw = w // 8
    dtype = jnp.bfloat16
    views = img.reshape(2, h2, w)
    n_pg = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_enc_stereo_ilv_kernel, rounding=rounding,
                               groups=PK._stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves)
    grid_spec = pl.GridSpec(
        grid=(n_pg,),
        in_specs=[
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (0, pg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (1, pg, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec((32 * halves, 32 * halves), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 32 * halves, bw),
                               lambda pg: (0, pg, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((64, 2 * (h2 // 8), bw), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * halves * n_pg,
            bytes_accessed=2 * h * w, transcendentals=0),
    )(views, views, jnp.asarray(PK._row_basis_np()).astype(dtype),
      jnp.asarray(PK._stereo_col_basis_np()).astype(dtype),
      PK._stereo_q_tile(scales), jnp.asarray(_zipmat_np(halves)))


def main():
    lut = jnp.asarray(default_quant_lut(100))
    scales = quant_scales(lut)
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))

    # reference interleaved stream via the shipping kernel + transpose
    ref = np.asarray(PK._enc_stereo_panels(img, scales, rounding="rne"))
    ref_2d = ref.reshape(64, -1, ref.shape[-1])          # (64, 2S, BW)
    try:
        got = np.asarray(enc_stereo_ilv(img, scales))
        print("compiles; byte-exact vs shipping interleaved:",
              np.array_equal(got, ref_2d), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAILED to lower/run: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return

    # walls: new fused-interleave vs two-dispatch shipping interleave vs
    # planar fast path (paired cycles)
    def batches(sizes=(8, 136)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b, H, W), 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    bs = batches()
    f1 = jax.jit(jax.vmap(
        lambda v: PK._enc_stereo_panels(v, scales, rounding="rne")))
    f2 = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))
    fns = {
        "ship_interleaved": lambda xb: f2(f1(xb)),
        "ilv_fused": jax.jit(lambda xs: jnp.sum(jax.vmap(
            lambda v: enc_stereo_ilv(v, scales))(xs).astype(jnp.int32))),
        "planar": jax.jit(lambda xs: jnp.sum(jax.vmap(
            lambda v: PK._enc_stereo_panels(
                v, scales, rounding="rne", view_layout="planar"))(xs)
            .astype(jnp.int32))),
    }
    for f in fns.values():
        for _, xb in bs:
            float(f(xb))
    cyc = {m: [] for m in fns}
    for _ in range(6):
        best = {}
        for _ in range(8):
            for m, f in fns.items():
                for bsz, xb in bs:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(m, bsz)] = min(best.get((m, bsz), 1e9),
                                         time.perf_counter() - t0)
        (b0, _), (b1, _) = bs
        for m in fns:
            cyc[m].append((best[(m, b1)] - best[(m, b0)]) / (b1 - b0) * 1e6)
    for m, v in cyc.items():
        med = statistics.median([x for x in v if x > 0] or [float("nan")])
        print(f"{m}: {med:.1f} us/dual-view-4K  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
