"""Cost attribution for the stereo decode kernel (round 4).

The interleaved stereo decode (146 us/dual-view 4K, 0.36-0.43 of copy)
runs three byte-reassembly stages before its matmuls.  This probe
measures where the wall actually is by timing WRONG-BYTES variants that
delete one stage at a time (identical memory volume and matmul count,
so the delta is that stage's cost):

  full     — shipping kernel (correct bytes)
  no_t23   — stage-2/3 transposes deleted: zq read straight from a_scr
  no_scr   — stage 1 deleted too: zq from small masked in_ref reads
  floor    — everything deleted: zq is an aligned garbage scratch read
             (pure load/dequant/matmul/store pipeline)
  floor_nodq / floor_rawstore / floor_noin / floor_2out — micro-
             variants stripping the dequant chain, the store chain,
             the in-block DMA, and the 3-D out ref in turn

(the FINAL committed file keeps full/floor/floor_2out in the measure
list; earlier variants' numbers are recorded below)

Run: python experiments/exp_r12_dec_stereo_cost.py  [HALVES=1|2]

MEASURED (round 4, chip, paired 6-cycle medians, noisy phases):
  full ~136-156, no_t23 ~121-130, no_scr ~115-132, floor ~115-132,
  floor_nodq ~124, floor_rawstore ~127, floor_noin ~114,
  floor_2out ~130.  CONCLUSION: the byte reassembly costs only
  ~20-35 us; the ~115-130 us "floor" is dominated by the
  (64, 32, 960) in-block DMA — see the copy probes and the u8
  minor-dim lesson in docs/STATUS.md, and exp_r13/r14 for the proof
  that no re-blocking formulation beats it.
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
from simd_dct_tpu.core.quantize import default_quant_lut, dequant_scales

H2, W = 2048, 3840


def _kernel(in_ref, b_ref, a_ref, qi_ref, *rest,
            groups, dtype, halves, variant):
    if variant == "floor_2out":
        out0_ref, out1_ref, a_scr, b_scr = rest
        outs = (out0_ref, out1_ref)
    else:
        out_ref, a_scr, b_scr = rest
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    half = in_ref.shape[-1] // 2

    for h in range(halves):
        for view in range(2):
            for base, size in groups:
                w16 = 16 * size
                if variant in ("full", "no_t23"):
                    for u in range(8):
                        for v in range(8):
                            src = in_ref[u * 8 + v, pl.ds(h * 16, 16),
                                         pl.ds(view * half + base * 16,
                                               w16)]
                            a_scr[pl.ds(u * 16, 16),
                                  pl.ds(v * 128, w16)] = src
                if variant == "full":
                    for v in range(8):
                        t = a_scr[:, pl.ds(v * 128, 128)].T
                        for i in range(size):
                            b_scr[pl.ds(v * 16, 16),
                                  pl.ds(i * 128, 128)] = \
                                t[i * 16:(i + 1) * 16, :]
                for i in range(size):
                    c = base + i
                    if variant == "full":
                        zq = b_scr[:, pl.ds(i * 128, 128)].T
                    elif variant == "no_t23":
                        zq = a_scr[:, pl.ds((i % 8) * 128, 128)]
                    elif variant == "no_scr":
                        zq = in_ref[i % 64, pl.ds(h * 16, 16),
                                    pl.ds(view * half, 128)]
                        zq = jnp.concatenate([zq] * 8, axis=0)
                    else:   # floor*: aligned full-tile garbage read —
                        # pure load/dequant/matmul/store pipeline
                        zq = b_scr[:, pl.ds(128, 128)]
                    if variant == "floor_nodq":
                        z = zq.astype(jnp.int32).astype(jnp.float32).astype(dtype)
                    else:
                        z = None
                    if z is None:
                        z = ((zq.astype(jnp.int32).astype(jnp.float32)
                              - 127.0) * qi_big).astype(dtype)
                    y = jax.lax.dot_general(z, amat,
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp
                                            .float32).astype(dtype)
                    x = jax.lax.dot_general(bmat, y,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp
                                            .float32)
                    if variant == "floor_rawstore":
                        out_ref[view, pl.ds(h * PANEL, PANEL),
                                pl.ds(c * CHUNK, CHUNK)] = \
                            pltpu.bitcast(x, jnp.uint8)[:PANEL, :]
                    else:
                        px = jnp.clip(jnp.rint(x * jnp.float32(255.0)),
                                      0.0, 255.0)
                        pb = px.astype(jnp.int32).astype(jnp.uint8)
                        if variant == "floor_2out":
                            outs[view][pl.ds(h * PANEL, PANEL),
                                       pl.ds(c * CHUNK, CHUNK)] = pb
                        else:
                            out_ref[view, pl.ds(h * PANEL, PANEL),
                                    pl.ds(c * CHUNK, CHUNK)] = pb


@functools.partial(jax.jit, static_argnames=("variant",))
def dec_var(planar, inv_scales, variant="full"):
    _, s, _, bw = planar.shape
    h2, w = s * 8, bw * 8
    dtype = jnp.bfloat16
    halves = int(os.environ.get("HALVES", "2")) if h2 > PANEL else 1
    n_pg = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_kernel,
                               groups=PK._stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves, variant=variant)
    flat = planar.reshape(64, s, 2 * bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pg,),
        in_specs=[pl.BlockSpec(
            ((1 if variant == "floor_noin" else 64), 16 * halves, 2 * bw),
            lambda pg: (0, pg, 0))] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0))] * 3,
        out_specs=(
            [pl.BlockSpec((PANEL * halves, w), lambda pg: (pg, 0))] * 2
            if variant == "floor_2out" else
            pl.BlockSpec((2, PANEL * halves, w), lambda pg: (0, pg, 0))),
        scratch_shapes=[pltpu.VMEM((128, 1024), jnp.uint8),
                        pltpu.VMEM((128, 1024), jnp.uint8)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((h2, w), jnp.uint8)] * 2
            if variant == "floor_2out" else
            jax.ShapeDtypeStruct((2, h2, w), jnp.uint8)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * n_pg,
            bytes_accessed=4 * h2 * w, transcendentals=0),
    )(flat, jnp.asarray(PK._row_basis_np()).astype(dtype),
      jnp.asarray(PK._stereo_col_basis_np()).astype(dtype),
      PK._stereo_q_tile(inv_scales))
    if variant == "floor_2out":
        return jnp.concatenate(out, axis=0)
    return out.reshape(2 * h2, w)


def main():
    lut = jnp.asarray(default_quant_lut(100))
    inv = dequant_scales(lut)
    rng = np.random.default_rng(11)
    s, bw = H2 // 8, W // 8
    rec = jnp.asarray(rng.integers(0, 256, (64, s, 2, bw), np.uint8))

    ship = np.asarray(PK._dec_stereo_panels(rec, inv))
    full = np.asarray(dec_var(rec, inv, "full"))
    print("full variant byte-exact vs shipping:",
          np.array_equal(full, ship), flush=True)

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    fns = {v: csum(functools.partial(
        lambda p, vv: dec_var(p, inv, vv), vv=v))
        for v in ("full", "floor", "floor_2out")}
    bs = []
    for b in (4, 100):
        xb = jnp.asarray(rng.integers(0, 256, (b, 64, s, 2, bw), np.uint8))
        xb.block_until_ready()
        bs.append((b, xb))
    for f in fns.values():
        for _, xb in bs:
            float(f(xb))
    cyc = {m: [] for m in fns}
    for _ in range(6):
        best = {}
        for _ in range(6):
            for m, f in fns.items():
                for b, xb in bs:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(m, b)] = min(best.get((m, b), 1e9),
                                       time.perf_counter() - t0)
        for m in fns:
            cyc[m].append((best[(m, 100)] - best[(m, 4)]) / 96 * 1e6)
    for m, v in cyc.items():
        print(f"{m}: median {statistics.median(v):.1f} us  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
