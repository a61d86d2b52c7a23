"""Microbenchmark: raw MXU matmul THROUGHPUT for bf16 vs s8 vs mixed.

Isolates the question exp_r8_s8dct.py raised: the s8-basis encode
kernels measured SLOWER than bf16 even when they strictly remove VPU
work — is the s8 (128,128)x(128,128) dot slow, or is mixing s8 and
bf16 matmuls in one kernel the problem?

All matmuls are INDEPENDENT (16 distinct LHS slices x 8 distinct
constant RHS tiles = 128 matmuls per 256 KB input block, so the MXU
dominates the DMA ~10x) — this measures throughput, which is what the
unrolled chunk loops of the real kernels see.  v5e spec: bf16 21 ns /
s8 10.6 ns per (128,128,128).

Run: python experiments/exp_r8_mxu_rate.py
"""
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

SLICES = 16            # (2048, 128) input block = 16 distinct LHS tiles
CONSTS = 8             # 8 distinct RHS tiles -> 128 matmuls / block


def _mk(mode: str):
    def kernel(x_ref, c_ref, o_ref):
        if mode == "bf16":
            cs = [c_ref[k * 128:(k + 1) * 128, :].astype(jnp.bfloat16)
                  for k in range(CONSTS)]
            tot = None
            for r in range(SLICES):
                xb = x_ref[r * 128:(r + 1) * 128, :].astype(jnp.int32) \
                    .astype(jnp.bfloat16)
                for k in range(CONSTS):
                    p = jnp.dot(xb, cs[k],
                                preferred_element_type=jnp.float32)
                    tot = p if tot is None else tot + p
            o_ref[...] = tot.astype(jnp.int32).astype(jnp.uint8)
        elif mode == "s8":
            cs = [c_ref[k * 128:(k + 1) * 128, :] for k in range(CONSTS)]
            tot = None
            for r in range(SLICES):
                xs = pltpu.bitcast(x_ref[r * 128:(r + 1) * 128, :],
                                   jnp.int8)
                for k in range(CONSTS):
                    p = jax.lax.dot_general(
                        xs, cs[k], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    tot = p if tot is None else tot + p
            o_ref[...] = (tot & 255).astype(jnp.uint8)
        else:  # mixed: alternate s8 / bf16 dots
            cs8 = [c_ref[k * 128:(k + 1) * 128, :] for k in range(CONSTS)]
            csb = [c.astype(jnp.float32).astype(jnp.bfloat16) for c in cs8]
            tot8 = totb = None
            for r in range(SLICES):
                xs = pltpu.bitcast(x_ref[r * 128:(r + 1) * 128, :],
                                   jnp.int8)
                xb = x_ref[r * 128:(r + 1) * 128, :] \
                    .astype(jnp.int32).astype(jnp.bfloat16)
                for k in range(CONSTS):
                    if (r + k) % 2 == 0:
                        p = jax.lax.dot_general(
                            xs, cs8[k], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        tot8 = p if tot8 is None else tot8 + p
                    else:
                        p = jnp.dot(xb, csb[k],
                                    preferred_element_type=jnp.float32)
                        totb = p if totb is None else totb + p
            o_ref[...] = ((tot8 & 255) + totb.astype(jnp.int32)) \
                .astype(jnp.uint8)

    rng = np.random.default_rng(1)
    cm = rng.integers(-3, 4, (128 * CONSTS, 128))
    c = jnp.asarray(cm.astype(np.int8)) if mode != "bf16" \
        else jnp.asarray(cm.astype(np.float32))

    @jax.jit
    def run(x):
        n = x.shape[0] // (128 * SLICES)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((128 * SLICES, 128), lambda p: (p, 0)),
                      pl.BlockSpec((128 * CONSTS, 128), lambda p: (0, 0))],
            out_specs=pl.BlockSpec((128, 128), lambda p: (p, 0)),
            out_shape=jax.ShapeDtypeStruct((n * 128, 128), jnp.uint8),
        )(x, c)
    return run


def main():
    rng = np.random.default_rng(0)
    n_blk_s, n_blk_b = 16, 512
    x_small = jnp.asarray(
        rng.integers(0, 256, (128 * SLICES * n_blk_s, 128), np.uint8))
    x_big = jnp.asarray(
        rng.integers(0, 256, (128 * SLICES * n_blk_b, 128), np.uint8))
    n_small = n_blk_s * SLICES * CONSTS
    n_big = n_blk_b * SLICES * CONSTS

    sums = {}
    for mode in ("bf16", "s8", "mixed"):
        try:
            f = _mk(mode)
            jax.block_until_ready(f(x_small))
            sums[mode] = jax.jit(
                lambda xx, f=f: jnp.sum(f(xx).astype(jnp.int32)))
            print(f"{mode}: compiles + runs", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for f in sums.values():
        float(f(x_small)), float(f(x_big))
    cyc = {m: [] for m in sums}
    for _ in range(6):
        best = {}
        for _ in range(8):
            for m, f in sums.items():
                for tag, xb in (("s", x_small), ("b", x_big)):
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(m, tag)] = min(best.get((m, tag), 1e9),
                                         time.perf_counter() - t0)
        for m in sums:
            cyc[m].append((best[(m, "b")] - best[(m, "s")])
                          / (n_big - n_small) * 1e9)
    for m, v in cyc.items():
        med = statistics.median([x for x in v if x > 0] or [float("nan")])
        print(f"{m}: {med:.2f} ns/matmul  cycles="
              f"{[round(x, 2) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
