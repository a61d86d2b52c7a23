"""A/B: stereo planar encode — XLA view-interleave stack (current) vs
in-kernel row-interleaved (64, 2S, BW) stores via a constant (32,32)
0/1 sublane-interleave matmul (bytes <= 255 are exact in bf16).

Row order strip*2+view makes the flatten to the reference byte stream a
pure reshape, eliminating the XLA stack epilogue on 4K.

VERDICT (measured v5e, 8/40-frame slope, best-of-8 walls): NEGATIVE.
Byte-identical to the shipping path, but 1333 us/frame vs 225 us for
the current kernel+stack — the 64 planes x 4 groups x 16 panels of
(32,32)@(32,<=128) interleave matmuls plus their u8<->bf16 casts are
latency-bound and cost ~6x more than the epilogue they replace.  The
shipping two-output + jnp.stack design stands (~0.49x copy roofline
per byte on the dual-view frame, which carries 2x the bytes of the
mono modes)."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import simd_dct_tpu as sd  # noqa: E402
from simd_dct_tpu.kernels import pallas_dct as PD  # noqa: E402
from simd_dct_tpu.core.quantize import quant_scales  # noqa: E402


def _ilv_mat_np():
    p = np.zeros((32, 32), np.float32)
    for view in range(2):
        for m in range(16):
            p[2 * m + view, view * 16 + m] = 1.0
    return p


def _kernel(xl_ref, xr_ref, b_ref, a_ref, q_ref, p_ref, o_ref, *,
            rounding, groups, dtype):
    bmat, amat, q_big = b_ref[...], a_ref[...], q_ref[...]
    pmat = p_ref[...]

    def compute_tile(x_ref, c):
        x = (x_ref[0, :, pl.ds(c * 128, 128)].astype(jnp.int32)
             .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32).astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        return PD._quantize_tile(z * q_big, rounding)

    for base, size in groups:
        tl = [compute_tile(xl_ref, base + i) for i in range(size)]
        tr = [compute_tile(xr_ref, base + i) for i in range(size)]
        for u in range(8):
            for v in range(8):
                pcl = jnp.concatenate(
                    [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                     for t in tl], axis=1)
                pcr = jnp.concatenate(
                    [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                     for t in tr], axis=1)
                st = jnp.concatenate([pcl, pcr], axis=0) \
                    .astype(jnp.int32).astype(jnp.bfloat16)
                ilv = jnp.dot(pmat, st, preferred_element_type=jnp.float32)
                o_ref[u * 8 + v, :, pl.ds(base * 16, 16 * size)] = \
                    ilv.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rounding",))
def enc_stereo_ilv(img, scales, rounding="rne"):
    h, w = img.shape
    h2 = h // 2
    n_pg = -(-h2 // 128)
    bw = w // 8
    views = img.reshape(2, h2, w)
    dtype = jnp.bfloat16
    kernel = functools.partial(_kernel, rounding=rounding,
                               groups=PD._stereo_groups(w // 128),
                               dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_pg,),
        in_specs=[
            pl.BlockSpec((1, 128, w), lambda pg: (0, pg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, w), lambda pg: (1, pg, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec((32, 32), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 32, bw), lambda pg: (0, pg, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 2 * (h2 // 8), bw), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * n_pg,
            bytes_accessed=2 * h * w, transcendentals=0),
    )(views, views,
      jnp.asarray(PD._row_basis_np()).astype(dtype),
      jnp.asarray(PD._stereo_col_basis_np()).astype(dtype),
      PD._stereo_q_tile(scales),
      jnp.asarray(_ilv_mat_np()).astype(jnp.bfloat16))
    return out.reshape(-1)


def main():
    H, W = 4096, 3840
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W), np.uint8)
    lut = sd.default_quant_lut(100)
    scales = quant_scales(jnp.asarray(lut))

    # correctness vs the shipping fused path
    ref = np.asarray(PD.encode_quantize_stereo(jnp.asarray(img), lut))
    got = np.asarray(enc_stereo_ilv(jnp.asarray(img), scales))
    diff = np.abs(ref.astype(np.int16) - got.astype(np.int16))
    print("ilv vs shipping: max", diff.max(initial=0),
          "rate", np.count_nonzero(diff) / diff.size)

    # honest two-dispatch walls, slope over batch
    rd = jax.jit(lambda r: jnp.sum(r.astype(jnp.uint32)))
    cur = jax.jit(jax.vmap(
        lambda x: PD.encode_quantize_stereo(x, lut)))
    new = jax.jit(jax.vmap(lambda x: enc_stereo_ilv(x, scales)))

    def slope(f1, b1=2, b2=14, tries=9):
        x1 = jnp.asarray(np.repeat(img[None], b1, 0))
        x2 = jnp.asarray(np.repeat(img[None], b2, 0))
        float(rd(f1(x1))); float(rd(f1(x2)))
        ss = []
        for _ in range(tries):
            t0 = time.perf_counter(); float(rd(f1(x1)))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); float(rd(f1(x2)))
            tb = time.perf_counter() - t0
            s = (tb - ta) / (b2 - b1)
            if s > 0:
                ss.append(s)
        return float(np.median(ss)) * 1e6

    for name, f in (("current (stack epilogue)", cur),
                    ("interleaved stores", new)):
        us = slope(f)
        print(f"{name}: {us:.1f} us/4K dual-view frame "
              f"({H*W*2/(us*1e-6)/1e9:.0f} GB/s logical)")


if __name__ == "__main__":
    main()
