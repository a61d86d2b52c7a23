"""Round-3 chained-slope estimator: kill the tunnel-jitter noise floor.

The batched-slope estimator (bench.py) divides per-call wall jitter by
the batch separation (128 frames -> +-8 us/frame at +-1 ms jitter) —
measured spread on one kernel was 15-48 us across rounds, useless for a
0.9-vs-1.0 fraction call.  This experiment instead CHAINS the op inside
one dispatch: y = op(y) repeated K times via lax.fori_loop (the op's
output is reshaped back to the input geometry, so every iteration does a
full HBM read+write of the frame batch), and takes the slope over K.
At B=16 frames and K separation 32, jitter divides by 512 frames ->
+-2 us/frame, and dispatch overhead cancels exactly as before.

Variants:
  copy_xla   y = y + 1 (u8) chained          — XLA elementwise copy
  copy_pal   y = pallas_vmem_copy(y) chained — Pallas copy, 256-row blocks
  enc32      y = reshape(enc32(y)) chained   — the shipping fused encode
             ((S, 8W) records reshape to (H2, W) contiguously, so the
             chain feeds records back in as pixels; timing is data-
             independent)

Usage: python experiments/exp_r5_chain.py [rounds] [B] [K1] [K2]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simd_dct_tpu.kernels import pallas_dct as PK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

H2, W = 2048, 3840
LOGICAL = H2 * W * 2


def pallas_copy_vmem(rows=256):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def one(v):
        return pl.pallas_call(
            kernel,
            grid=(H2 // rows,),
            in_specs=[pl.BlockSpec((rows, W), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, W), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H2, W), jnp.uint8),
        )(v)
    return one


def chain(one_frame_op, k):
    """jit(xs -> checksum) running k chained full-batch sweeps."""
    def body(_, y):
        return jax.vmap(one_frame_op)(y)

    @jax.jit
    def f(xs):
        y = jax.lax.fori_loop(0, k, body, xs)
        return jnp.sum(y.astype(jnp.int32))
    return f


def wall(f, xb, reps=6):
    float(f(xb))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(xb))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    args = sys.argv[1:]
    rounds = int(args[0]) if len(args) > 0 else 5
    B = int(args[1]) if len(args) > 1 else 16
    K1 = int(args[2]) if len(args) > 2 else 4
    K2 = int(args[3]) if len(args) > 3 else 36
    print(f"devices: {jax.devices()}  B={B} K={K1},{K2}")

    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)
    key = jax.random.PRNGKey(0)
    xs = jax.random.randint(key, (B, H2, W), 0, 256,
                            dtype=jnp.int32).astype(jnp.uint8)
    jax.block_until_ready(xs)

    def enc_one(v):
        r = PK._enc32_panels(v, scales, normalize=False,
                             rounding="rne", precision="bf16")
        return r.reshape(H2, W)

    pal_copy = pallas_copy_vmem()
    variants = {
        "copy_xla": lambda v: v + jnp.uint8(1),
        "copy_pal": pal_copy,
        "enc32": enc_one,
    }
    fns = {name: (chain(op, K1), chain(op, K2))
           for name, op in variants.items()}

    per = {k: [] for k in variants}
    ratios = []
    denom = (K2 - K1) * B
    for r in range(rounds):
        row = {}
        for name, (f1, f2) in fns.items():
            t1 = wall(f1, xs)
            t2 = wall(f2, xs)
            row[name] = 1e6 * (t2 - t1) / denom
            per[name].append(row[name])
        best_copy = min(row["copy_xla"], row["copy_pal"])
        if row["enc32"] > 0:
            ratios.append(best_copy / row["enc32"])
        print(f"round {r}: " + "  ".join(
            f"{k}={v:6.2f}us" for k, v in row.items())
            + (f"  ratio={ratios[-1]:.4f}" if ratios else ""), flush=True)

    print("\nmedians (us/frame, logical GB/s @ 2B/px):")
    for k, vals in per.items():
        m = statistics.median(vals)
        print(f"  {k:9s} {m:6.2f} us   {LOGICAL / m / 1e3 / 1e3:7.3f} "
              f"TB/s-logical" if m > 0 else f"  {k:9s} n/a")
    if ratios:
        print(f"median paired enc/copy fraction = "
              f"{statistics.median(ratios):.4f}  "
              f"(spread {min(ratios):.3f}..{max(ratios):.3f})")


if __name__ == "__main__":
    main()
