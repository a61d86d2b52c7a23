"""Can the pair->scalar byte permutation (a 0/1 matrix) run as an int8
MXU matmul instead of the shipping bf16 one?

The Pi matmul moves BYTES: out = bytes @ Pi with Pi a permutation.  In
s8 x s8 -> s32 arithmetic each output is exactly one input byte
(possibly sign-wrapped), so `& 0xFF` recovers the u8 value EXACTLY —
no u8->i32->bf16 / f32->i32->u8 conversion chains, and v5e's MXU runs
int8 at 2x the bf16 rate.  This probe checks (a) Mosaic lowers the s8
dot at all, (b) byte-exactness vs the bf16 path, (c) the wall.

Run: python experiments/exp_r7_pi_s8.py
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

from simd_dct_tpu.kernels.pallas_dct import _scalar_from_pair_pi

ROWS, REPS = 4096, 32   # per-step byte panel, matmuls per grid step


def _mk(mode: str):
    pi_np = _scalar_from_pair_pi()

    def kernel(x_ref, pi_ref, o_ref):
        x = x_ref[...]
        pi = pi_ref[...]
        acc = None
        for r in range(REPS):
            blk = x[r * 128:(r + 1) * 128, :]
            if mode == "s8":
                p = jax.lax.dot_general(
                    pltpu.bitcast(blk, jnp.int8), pi,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = (p & 255).astype(jnp.uint8)
            else:
                b = blk.astype(jnp.int32).astype(jnp.bfloat16)
                p = jnp.dot(b, pi, preferred_element_type=jnp.float32)
                out = p.astype(jnp.int32).astype(jnp.uint8)
            o_ref[r * 128:(r + 1) * 128, :] = out

    if mode == "s8":
        pi = jnp.asarray(pi_np.astype(np.int8))
    else:
        pi = jnp.asarray(pi_np.astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x):
        n = x.shape[0] // ROWS
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((ROWS, 128), lambda p: (p, 0)),
                      pl.BlockSpec((128, 128), lambda p: (0, 0))],
            out_specs=pl.BlockSpec((ROWS, 128), lambda p: (p, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        )(x, pi)
    return run


def main():
    rng = np.random.default_rng(0)
    x_small = jnp.asarray(rng.integers(0, 256, (ROWS * 4, 128), np.uint8))
    x_big = jnp.asarray(rng.integers(0, 256, (ROWS * 16, 128), np.uint8))

    runs = {}
    for mode in ("bf16", "s8"):
        try:
            f = _mk(mode)
            y = f(x_small)
            jax.block_until_ready(y)
            runs[mode] = (f, np.asarray(y))
            print(f"{mode}: compiles + runs", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED — {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if "s8" in runs and "bf16" in runs:
        same = np.array_equal(runs["s8"][1], runs["bf16"][1])
        print("byte-exact s8 == bf16:", same, flush=True)
        # ground truth
        ref = (np.asarray(x_small, np.int64)
               @ _scalar_from_pair_pi().astype(np.int64)) & 255
        print("s8 == numpy Pi:", np.array_equal(
            runs["s8"][1], ref.astype(np.uint8)), flush=True)

    sums = {m: jax.jit(lambda xx, f=f: jnp.sum(f(xx).astype(jnp.int32)))
            for m, (f, _) in runs.items()}
    for m, f in sums.items():
        float(f(x_small)), float(f(x_big))
    cyc = {m: [] for m in sums}
    for _ in range(5):
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
                          / (x_big.size - x_small.size) * 1e9)
    for m, v in cyc.items():
        med = statistics.median([x for x in v if x > 0] or [float("nan")])
        print(f"{m}: {med:.4f} ns/byte "
              f"({[round(x, 4) for x in v]})", flush=True)


if __name__ == "__main__":
    main()
