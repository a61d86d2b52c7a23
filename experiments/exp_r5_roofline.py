"""Round-3 roofline decomposition: what IS the copy wall on this chip?

BENCH_r03 prep measured the fused enc32 kernel FASTER than the XLA
elementwise copy probe (paired ratio 1.22), tripping the
``encode_exceeds_copy_roofline`` flag.  Worse, correcting either probe's
reported GB/s for its checksum read (3 B/px real traffic on 2 B/px
accounting) implies >1 TB/s real bandwidth — above the v5e spec table's
819 GB/s.  Either the 'TPU v5 lite' behind the axon tunnel is a faster
part than the spec table assumes, or the XLA probe is simply slower per
byte than the Pallas kernels and the roofline needs a Pallas probe.

Variants (all slopes on (8, 136)-frame device batches, every wall ends
with a checksum SCALAR on the host; rounds interleave all variants so
tunnel phase drift cancels in the ratios):

  xla_u8      current bench probe: jit(x+1) then jit(sum)  (2 dispatches)
  xla_u32     same over u32 lanes (current second probe)
  pal_vmem    pallas copy via VMEM blocks (256, W), fused-sum checksum
  pal_vmem32  same, u32 lanes
  pal_dma     pallas HBM->HBM make_async_copy (the true memcpy), + sum
  enc32       the shipping fused encode kernel, fused-sum checksum

Usage: python experiments/exp_r5_roofline.py [rounds]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simd_dct_tpu.kernels import pallas_dct as PK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

H2, W = 2048, 3840
LOGICAL = H2 * W * 2  # 2 B/px accounting, same as bench.py


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


def slope_us(f, batches, reps=12):
    walls = {}
    for bsz, xb in batches:
        float(f(xb))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(xb))
            best = min(best, time.perf_counter() - t0)
        walls[bsz] = best
    (b0, _), (b1, _) = batches
    return 1e6 * (walls[b1] - walls[b0]) / (b1 - b0)


def pallas_copy_vmem(dtype, w, rows=256):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def one(v):
        return pl.pallas_call(
            kernel,
            grid=(H2 // rows,),
            in_specs=[pl.BlockSpec((rows, w), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, w), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H2, w), dtype),
        )(v)
    return one


def pallas_copy_dma_batched():
    """One HBM->HBM DMA of the WHOLE batch (memory_space=ANY requires a
    trivial index map, so the batch axis must stay inside the kernel)."""
    def kernel(x_ref, o_ref, sem):
        cp = pltpu.make_async_copy(x_ref, o_ref, sem)
        cp.start()
        cp.wait()

    def f(xb):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            out_shape=jax.ShapeDtypeStruct(xb.shape, xb.dtype),
        )(xb)
        return jnp.sum(out.astype(jnp.int32))
    return jax.jit(f)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
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

    def fused_sum(one):
        return jax.jit(lambda xs: jnp.sum(
            jax.vmap(one)(xs).astype(jnp.int32)))

    variants = {
        "xla_u8": (bs_u8, xla_two_dispatch(jnp.uint8)),
        "xla_u32": (bs_u32, xla_two_dispatch(jnp.uint32)),
        "pal_vmem": (bs_u8, fused_sum(pallas_copy_vmem(jnp.uint8, W))),
        "pal_vmem512": (bs_u8, fused_sum(
            pallas_copy_vmem(jnp.uint8, W, rows=512))),
        "pal_dma": (bs_u8, pallas_copy_dma_batched()),
        "enc32": (bs_u8, fused_sum(
            lambda v: PK._enc32_panels(v, scales, normalize=False,
                                       rounding="rne", precision="bf16"))),
    }

    per = {k: [] for k in variants}
    ratios = []
    for r in range(rounds):
        row = {}
        for name, (bs, f) in variants.items():
            try:
                us = slope_us(f, bs)
            except Exception as e:  # noqa: BLE001
                us = float("nan")
                print(f"  {name}: {type(e).__name__}: {e}")
            row[name] = us
            if us > 0:
                per[name].append(us)
        copies = [v for k, v in row.items() if k != "enc32" and v > 0]
        if copies and row.get("enc32", 0) > 0:
            ratios.append(min(copies) / row["enc32"])
        print(f"round {r}: " + "  ".join(
            f"{k}={v:7.1f}us" for k, v in row.items())
            + (f"  ratio={ratios[-1]:.3f}" if ratios else ""), flush=True)

    print("\nmedians (us/frame, logical GB/s @ 2B/px):")
    meds = {}
    for k, vals in per.items():
        if vals:
            m = statistics.median(vals)
            meds[k] = m
            print(f"  {k:11s} {m:7.1f} us   {LOGICAL / m / 1e3:7.1f} GB/s")
    if ratios:
        print(f"\nmedian per-round paired enc/copy fraction = "
              f"{statistics.median(ratios):.4f}")


if __name__ == "__main__":
    main()
