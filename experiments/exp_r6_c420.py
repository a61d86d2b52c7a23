"""4:2:0 fused encode wall vs the 4:4:4 color kernel on the live chip
(plus on-chip correctness vs the XLA tier).

Run: python experiments/exp_r6_c420.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simd_dct_tpu.kernels import color420 as C420
from simd_dct_tpu.kernels import color32 as C444
from simd_dct_tpu.layout.color import BASE_CHROMA_QUANT_TABLE
from simd_dct_tpu.core.quantize import default_quant_lut

H2, W = 2048, 3840


def main():
    luma = jnp.asarray(default_quant_lut(100) * 255.0)
    chroma = jnp.asarray(BASE_CHROMA_QUANT_TABLE * 100 * 255.0)

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:512]
    base = (np.sin(xx / 19.0) * np.cos(yy / 13.0) * 0.5 + 0.5) * 200 + 20
    top = jnp.asarray(np.stack([
        np.clip(base * s + rng.normal(0, 4, (64, 512)), 0, 255)
        for s in (1.0, 0.8, 0.9)]).astype(np.uint8))
    y_x, c_x = C420.encode_ycbcr420_xla(top, luma, chroma)
    y_k, c_k = C420._enc420_panels(top, luma, chroma, precision="bf16")
    dy = np.abs(np.asarray(y_k, np.int32) - np.asarray(y_x, np.int32))
    dc = np.abs(np.asarray(c_k, np.int32) - np.asarray(c_x, np.int32))
    print("TPU enc diff y: max", dy.max(), "frac",
          round(float((dy > 0).mean()), 4), flush=True)
    print("TPU enc diff c: max", dc.max(), "frac",
          round(float((dc > 0).mean()), 4), flush=True)
    assert dy.max() <= 1 and dc.max() <= 1

    def batches(shape, sizes=(4, 28)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b,) + shape, 0, 256,
                dtype=jnp.int32).astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    bs = batches((3, H2, W))
    enc420 = jax.jit(lambda xs: sum(
        jnp.sum(r.astype(jnp.int32)) for r in jax.vmap(
            lambda p: C420._enc420_panels(p, luma, chroma))(xs)))
    dec420 = None
    y4, c4 = jax.vmap(lambda p: C420._enc420_panels(p, luma, chroma))(
        bs[0][1])
    ybig, cbig = jax.vmap(lambda p: C420._enc420_panels(p, luma, chroma))(
        bs[1][1])
    bs_dec = [(bs[0][0], (y4, c4)), (bs[1][0], (ybig, cbig))]
    jax.block_until_ready([y4, c4, ybig, cbig])
    dec420 = jax.jit(lambda yc: jnp.sum(jax.vmap(
        lambda y, c: C420._dec420_panels(y, c, luma, chroma))(
            yc[0], yc[1]).astype(jnp.int32)))
    enc444 = jax.jit(lambda xs: jnp.sum(jax.vmap(
        lambda p: C444._enc32_rgb_panels(p, luma, chroma))(xs)
        .astype(jnp.int32)))
    walls = {"enc420": (enc420, bs), "enc444": (enc444, bs),
             "dec420": (dec420, bs_dec)}
    for f, bsx in walls.values():
        for _, xb in bsx:
            float(f(xb))
    cyc = {k: [] for k in walls}
    for _ in range(5):
        best = {}
        for _ in range(8):
            for n, (f, bsx) in walls.items():
                for bsz, xb in bsx:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(n, bsz)] = min(best.get((n, bsz), 1e9),
                                         time.perf_counter() - t0)
        for n, (_, bsx) in walls.items():
            (b0, _), (b1, _) = bsx
            cyc[n].append((best[(n, b1)] - best[(n, b0)]) / (b1 - b0))
    for n, v in cyc.items():
        med = statistics.median([x for x in v if x > 0] or [float("nan")])
        print(f"{n}: {med * 1e6:.1f} us/frame "
              f"(cycles {[round(x * 1e6, 1) for x in v]})", flush=True)


if __name__ == "__main__":
    main()
