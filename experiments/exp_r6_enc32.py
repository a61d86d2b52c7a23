"""Round-3 (cont.) enc32 micro-variants: why is encode ~15% slower than
decode on the same byte volume (35.9 vs 31.3 us in the round-3 bench)?

Variants measured on the live chip with the interleaved-slope method:
  base      — shipping _enc32_panels (u8 -> i32 -> f32 -> bf16, halves=2)
  skipf32   — u8 -> i32 -> bf16 directly when normalize=False (one fewer
              VPU convert per element)
  halves4   — 4 panels per grid step (fewer grid steps, bigger blocks)
  skip+h4   — both

Run: python experiments/exp_r6_enc32.py
"""
import functools
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simd_dct_tpu.kernels import pallas_dct as PK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

PANEL, CHUNK = PK.PANEL, PK.CHUNK


def _enc32_kernel_v(x_ref, b_ref, a_ref, q_ref, out_ref, *, rounding,
                    num_chunks, dtype, halves, skip_f32):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]

    def compute_tile(h, c):
        xb = x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
        if skip_f32:
            x = xb.astype(jnp.int32).astype(dtype)
        else:
            x = xb.astype(jnp.int32).astype(jnp.float32).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32).astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        return PK._quantize_tile(z * q_big, rounding)

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


@functools.partial(jax.jit, static_argnames=("halves", "skip_f32"))
def enc32_v(view, scales, halves=2, skip_f32=False):
    h2, w = view.shape
    num_steps = -(-h2 // (PANEL * halves))
    num_chunks = w // CHUNK
    dtype = jnp.bfloat16
    kernel = functools.partial(_enc32_kernel_v, rounding="rne",
                               num_chunks=num_chunks, dtype=dtype,
                               halves=halves, skip_f32=skip_f32)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(PK._row_basis_np()).astype(dtype),
      jnp.asarray(PK._col_basis_np()).astype(dtype), PK._q_big(scales))


def main():
    H2, W = 2048, 3840
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)

    def batches(sizes=(8, 72)):
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

    variants = {
        "base": csum(lambda v: PK._enc32_panels(
            v, scales, normalize=False, rounding="rne", precision="bf16")),
        "skipf32": csum(lambda v: enc32_v(v, scales, skip_f32=True)),
        "halves4": csum(lambda v: enc32_v(v, scales, halves=4)),
        "skip+h4": csum(lambda v: enc32_v(v, scales, halves=4,
                                          skip_f32=True)),
    }
    # correctness first: variants must be byte-identical to base
    xs = bs[0][1][:1]
    ref = np.asarray(jax.vmap(lambda v: PK._enc32_panels(
        v, scales, normalize=False, rounding="rne", precision="bf16"))(xs))
    for name in ("skipf32", "halves4", "skip+h4"):
        h = "halves4" in name or "h4" in name
        got = np.asarray(jax.vmap(lambda v: enc32_v(
            v, scales, halves=4 if h else 2,
            skip_f32="skip" in name))(xs))
        n_bad = int((got != ref).sum())
        print(f"{name}: byte-diff vs base = {n_bad}", flush=True)
        assert n_bad == 0, name

    for _, f in variants.items():
        for _, xb in bs:
            float(f(xb))

    cycles = {k: [] for k in variants}
    for _ in range(5):
        best = {}
        for _ in range(8):
            for name, f in variants.items():
                for bsz, xb in bs:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(name, bsz)] = min(
                        best.get((name, bsz), 1e9),
                        time.perf_counter() - t0)
        (b0, _), (b1, _) = bs
        for name in variants:
            cycles[name].append(
                (best[(name, b1)] - best[(name, b0)]) / (b1 - b0))
    for name, vals in cycles.items():
        med = statistics.median([v for v in vals if v > 0] or [float("nan")])
        print(f"{name:8s} {med * 1e6:7.1f} us/frame   "
              f"(cycles: {[round(v * 1e6, 1) for v in vals]})")


if __name__ == "__main__":
    main()
