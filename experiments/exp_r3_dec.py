"""Decode-side tuning candidates (round-3 queue item 2).

Shipping walls on v5e (4K top view): enc32 28 us vs dec32 41 us; pair
dec 95 us; scalar dec 138 us; stereo dec ~170 us.  The dec32 kernel
assembles its (128,128) Z tile with a nested jnp.concatenate tree
(8 bands, axis=0) — the pair-decode kernel's own docstring records that
Mosaic lowers nested concats as repeated whole-tile copies (~7x slower
than sliced scratch stores, measured in round 2).  Candidate A replaces
the band tree with 8 aligned (16,128) VMEM scratch stores.

Run (correctness, CPU):   JAX_PLATFORMS=cpu python experiments/exp_r3_dec.py check
Run (walls, TPU tunnel):  python experiments/exp_r3_dec.py measure
"""

import functools
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from simd_dct_tpu.dispatch.capability import honor_cpu_platform_env  # noqa: E402
honor_cpu_platform_env()   # sitecustomize pins axon; env JAX_PLATFORMS loses

from simd_dct_tpu.kernels import pallas_dct as P              # noqa: E402
from simd_dct_tpu.core.quantize import dequant_scales          # noqa: E402


def _dec32_kernel_scratch(rec_ref, b_ref, a_ref, qi_ref, out_ref, zb_scr, *,
                          normalize: bool, num_chunks: int, dtype,
                          halves: int = 2):
    """_dec32_kernel with the band-concat tree replaced by aligned
    scratch stores (8 x (16,128) sublane-aligned)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    scale = jnp.float32(255.0) if normalize else jnp.float32(1.0)

    for h in range(halves):
        def chunk(c, carry):
            for k in range(4):
                g0 = rec_ref[pl.ds(h * 16, 16),
                             pl.ds(c * 1024 + k * 128, 128)]
                g1 = rec_ref[pl.ds(h * 16, 16),
                             pl.ds(c * 1024 + 512 + k * 128, 128)]
                zb_scr[pl.ds((2 * k) * 16, 16), :] = \
                    jnp.concatenate([g0[:, :64], g1[:, :64]], axis=1)
                zb_scr[pl.ds((2 * k + 1) * 16, 16), :] = \
                    jnp.concatenate([g0[:, 64:], g1[:, 64:]], axis=1)
            zb = zb_scr[...]
            z = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                 * qi_big).astype(dtype)
            y = jax.lax.dot_general(z, amat, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                .astype(dtype)
            x = jax.lax.dot_general(bmat, y, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = jnp.clip(jnp.rint(x * scale), 0.0, 255.0)
            out_ref[pl.ds(h * P.PANEL, P.PANEL), pl.ds(c * P.CHUNK, P.CHUNK)] = \
                v.astype(jnp.int32).astype(jnp.uint8)
            return carry

        jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "interpret",
                                             "precision"))
def dec32_scratch(records, qi, *, normalize: bool, interpret=False,
                  precision="bf16"):
    s, w8 = records.shape
    w = w8 // 8
    halves = 2 if s > 16 else 1
    num_steps = -(-s // (16 * halves))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_dec32_kernel_scratch, normalize=normalize,
                               num_chunks=w // P.CHUNK, dtype=dtype,
                               halves=halves)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0))] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0))] * 3,
        out_specs=pl.BlockSpec((P.PANEL * halves, w), lambda p: (p, 0)),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.uint8)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s * 8, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * s * 8 * w, transcendentals=0),
        interpret=interpret,
    )(records, jnp.asarray(P._row_basis_np()).astype(dtype),
      jnp.asarray(P._col_basis_np()).astype(dtype), P._q_big(qi))


def _mk_case(h2=256, w=512, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (2 * h2, w), dtype=np.uint8)
    lut = (np.linspace(0.1, 1.2, 64).astype(np.float32)) * 255.0
    rec = np.asarray(P.encode_quantize32(jnp.asarray(img), lut,
                                         interpret=True)) \
        .reshape(h2 // 8, 8 * w)
    return rec, lut


def check():
    rec, lut = _mk_case()
    qi = dequant_scales(lut)
    a = np.asarray(P._dec32_panels(jnp.asarray(rec), qi, normalize=False,
                                   interpret=True))
    b = np.asarray(dec32_scratch(jnp.asarray(rec), qi, normalize=False,
                                 interpret=True))
    assert np.array_equal(a, b), (a != b).mean()
    print("scratch dec32 == shipping dec32 (interpret):", a.shape)


def _slope(f, xs_small, xs_big, reps=8, tries=4):
    js = jax.jit(lambda xs: jnp.sum(jax.vmap(f)(xs).astype(jnp.int32)))
    float(js(xs_small)); float(js(xs_big))
    vals = []
    for _ in range(tries):
        walls = []
        for xb in (xs_small, xs_big):
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(js(xb))
                best = min(best, time.perf_counter() - t0)
            walls.append(best)
        v = (walls[1] - walls[0]) / (xs_big.shape[0] - xs_small.shape[0])
        if v > 0:
            vals.append(v)
    return statistics.median(vals) if vals else float("nan")


def measure():
    h2, w = 2048, 3840                      # 4K top view
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2 * h2, w), dtype=np.uint8)
    lut = (np.linspace(0.1, 1.2, 64).astype(np.float32)) * 255.0
    rec = np.asarray(P.encode_quantize32(jnp.asarray(img), lut)) \
        .reshape(h2 // 8, 8 * w)
    qi = dequant_scales(lut)
    b8 = jnp.asarray(np.stack([rec] * 8))
    b40 = jnp.asarray(np.stack([rec] * 40))
    for name, f in (
        ("shipping _dec32_panels",
         lambda r: P._dec32_panels(r, qi, normalize=False)),
        ("scratch dec32",
         lambda r: dec32_scratch(r, qi, normalize=False)),
    ):
        s = _slope(f, b8, b40)
        print(f"{name}: {s*1e6:.1f} us/frame")


if __name__ == "__main__":
    {"check": check, "measure": measure}[sys.argv[1]
                                         if len(sys.argv) > 1 else "check"]()
