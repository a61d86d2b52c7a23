"""Confirm run: enc32 halves=2 (shipping) vs halves=4, and dec32
halves=2 vs halves=4, head-to-head with more cycles.

Run: python experiments/exp_r6_confirm.py
"""
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp
import numpy as np

from simd_dct_tpu.kernels import pallas_dct as PK
from simd_dct_tpu.core.quantize import (default_quant_lut, quant_scales,
                                        dequant_scales)
from exp_r6_enc32 import enc32_v


def main():
    H2, W = 2048, 3840
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)
    inv = dequant_scales(lut)

    def batches(shape, sizes=(8, 72)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b,) + shape, 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    bs_enc = batches((H2, W))
    bs_dec = batches((H2 // 8, 8 * W))

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    variants = {
        "enc_h2": (bs_enc, csum(lambda v: PK._enc32_panels(
            v, scales, normalize=False, rounding="rne", precision="bf16"))),
        "enc_h4": (bs_enc, csum(lambda v: enc32_v(v, scales, halves=4))),
        "dec_h2": (bs_dec, csum(lambda r: PK._dec32_panels(
            r, inv, normalize=False))),
    }
    for _, (bs, f) in variants.items():
        for _, xb in bs:
            float(f(xb))

    cycles = {k: [] for k in variants}
    for _ in range(8):
        best = {}
        for _ in range(8):
            for name, (bs, f) in variants.items():
                for bsz, xb in bs:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(name, bsz)] = min(
                        best.get((name, bsz), 1e9),
                        time.perf_counter() - t0)
        for name, (bs, _) in variants.items():
            (b0, _), (b1, _) = bs
            cycles[name].append(
                (best[(name, b1)] - best[(name, b0)]) / (b1 - b0))
    for name, vals in cycles.items():
        med = statistics.median([v for v in vals if v > 0] or [float("nan")])
        print(f"{name:8s} {med * 1e6:7.1f} us/frame   "
              f"(cycles: {[round(v * 1e6, 1) for v in vals]})", flush=True)


if __name__ == "__main__":
    main()
