"""Round-3: interleaved-pair batched-slope estimator.

exp_r5_roofline.py showed the batched-slope readings swing 15-48 us on
ONE kernel across rounds.  Root cause candidate: _slope_ms times all
reps of batch b0, THEN all reps of b1 — multi-second tunnel phase drift
between the two blocks lands directly in the slope (+-1 ms / 128 frames
= +-8 us/frame).  This estimator interleaves the reps (b0, b1, b0, b1,
...) so both walls sample the same phases, and keeps the wide (8, 136)
separation.

Cross-check against the chained estimator (exp_r5_chain.py): the chained
XLA copy (y = y + 1, 2 B/px exactly, no per-iteration checksum) read
~26 us/frame = ~600 GB/s real — an interleaved batched xla_u8 probe
(3 B/px with its checksum dispatch) should read ~39 us -> ~400 GB/s on
the 2 B/px accounting if both estimators are sound.

Usage: python experiments/exp_r5_interleave.py [rounds]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from simd_dct_tpu.kernels import pallas_dct as PK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

H2, W = 2048, 3840
LOGICAL = H2 * W * 2


def dev_batches(shape, dtype=jnp.uint8, sizes=(8, 136)):
    out = []
    for b in sizes:
        key = jax.random.PRNGKey(b)
        if dtype == jnp.uint8:
            x = jax.random.randint(key, (b,) + shape, 0, 256,
                                   dtype=jnp.int32).astype(jnp.uint8)
        else:
            x = jax.random.randint(key, (b,) + shape, 0, 2 ** 31 - 1,
                                   dtype=jnp.int32).astype(dtype)
        out.append((b, x))
    jax.block_until_ready([x for _, x in out])
    return out


def slope_interleaved_us(f, batches, reps=12):
    """Alternate b0/b1 walls rep by rep; slope from the best of each."""
    (b0, x0), (b1, x1) = batches
    float(f(x0))
    float(f(x1))
    best0 = best1 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x0))
        best0 = min(best0, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f(x1))
        best1 = min(best1, time.perf_counter() - t0)
    return 1e6 * (best1 - best0) / (b1 - b0)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("devices:", jax.devices())
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)
    bs_u8 = dev_batches((H2, W))
    bs_u32 = dev_batches((H2, W // 4), jnp.uint32)

    def xla_two_dispatch(dtype):
        one = jnp.uint8(1) if dtype == jnp.uint8 else jnp.uint32(1)
        f1 = jax.jit(lambda xs: xs + one)
        f2 = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32))
                     if dtype == jnp.uint8 else jnp.sum(o).astype(jnp.float32))
        return lambda xb: f2(f1(xb))

    enc = jax.jit(lambda xs: jnp.sum(jax.vmap(
        lambda v: PK._enc32_panels(v, scales, normalize=False,
                                   rounding="rne", precision="bf16"))(xs)
        .astype(jnp.int32)))

    variants = {
        "xla_u8": (bs_u8, xla_two_dispatch(jnp.uint8)),
        "xla_u32": (bs_u32, xla_two_dispatch(jnp.uint32)),
        "enc32": (bs_u8, enc),
    }

    per = {k: [] for k in variants}
    ratios = []
    for r in range(rounds):
        row = {}
        for name, (bs, f) in variants.items():
            row[name] = slope_interleaved_us(f, bs)
            if row[name] > 0:
                per[name].append(row[name])
        copies = [v for k, v in row.items() if k != "enc32" and v > 0]
        if copies and row.get("enc32", 0) > 0:
            ratios.append(min(copies) / row["enc32"])
        print(f"round {r}: " + "  ".join(
            f"{k}={v:6.2f}us" for k, v in row.items())
            + (f"  ratio={ratios[-1]:.4f}" if ratios else ""), flush=True)

    print("\nmedians (us/frame, GB/s on 2B/px accounting):")
    for k, vals in per.items():
        if vals:
            m = statistics.median(vals)
            spread = (max(vals) - min(vals)) / m * 100
            print(f"  {k:8s} {m:6.2f} us  {LOGICAL / m / 1e3:6.1f} GB/s  "
                  f"(spread {spread:.0f}%)")
    if ratios:
        print(f"median paired enc/copy fraction = "
              f"{statistics.median(ratios):.4f}  "
              f"(spread {min(ratios):.3f}..{max(ratios):.3f})")


if __name__ == "__main__":
    main()
