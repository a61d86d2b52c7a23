"""Round-2 experiments, part 2.

  concat16   - stereo candidate A: 64x concat(8x(16,16)) u8 stores
  flatcast   - pure cost of lax.bitcast_convert_type on a FLAT i32 -> u8
  permcast   - XLA i32-granular permute of the P word tensor + bitcast
  ktranspose - in-kernel (128,128) u8 transpose cost on the mode32 path
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

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

from experiments.exp_r2_layout import slope, report, checksum, H2, W  # noqa


def exp_flatcast():
    n = H2 * W // 4

    def one(v):
        w = v[: H2 // 2].reshape(-1).astype(jnp.int32)  # (H2/2*W) i32 stand-in
        b = jax.lax.bitcast_convert_type(w, jnp.uint8)
        return b.reshape(-1)
    report("flat bitcast i32->u8", slope(checksum(one)))


def exp_permcast():
    """P word tensor (panels, 32, chunks, 128) i32 -> pair word stream:
    word = (panel, m, c, cell, half, v, blk); P axes (half,m),(cell,blk,v)."""
    def one(v8):
        # build a synthetic i32 tensor with the kernel's P shape from input
        p = H2 // 128
        nj = W // 128
        P = v8.reshape(p, 32, nj, 4, 32).astype(jnp.int32)
        # axes: (panel, half*16+m, chunk, ?, ?) -> expand
        P6 = P.reshape(p, 2, 16, nj, 8, 16)      # (panel, half, m, c, cell, blkv)
        # target (panel, m, c, cell, half, blkv)
        S = P6.transpose(0, 2, 3, 4, 1, 5)
        w = S.reshape(-1)
        b = jax.lax.bitcast_convert_type(w, jnp.uint8)
        return b.reshape(-1)
    report("i32 permute + bitcast", slope(checksum(one)))


def exp_ktranspose():
    """mode32 kernel + one extra in-kernel u8 transpose per chunk."""
    from simd_dct_tpu.kernels.pallas_dct import (
        _row_basis_np, _col_basis_np, _q_big, _quantize_tile, PANEL, CHUNK)
    from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales
    scales = quant_scales(jnp.asarray(default_quant_lut(100) * 255.0))

    def kernel(x_ref, b_ref, a_ref, q_ref, out_ref, *, num_chunks):
        bmat = b_ref[...]
        amat = a_ref[...]
        q_big = q_ref[...]

        def chunk(c, carry):
            x = (x_ref[:, pl.ds(c * CHUNK, CHUNK)].astype(jnp.int32)
                 .astype(jnp.float32)).astype(jnp.bfloat16)
            y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
            z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
            t = _quantize_tile(z * q_big, "rne")
            t = t.T  # in-kernel (128,128) u8 transpose
            out_ref[:, pl.ds(c * CHUNK, CHUNK)] = t
            return carry

        jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)

    @jax.jit
    def run(view):
        grid_spec = pl.GridSpec(
            grid=(H2 // PANEL,),
            in_specs=[
                pl.BlockSpec((PANEL, W), lambda p: (p, 0),
                             memory_space=pltpu.VMEM)] + [
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((PANEL, W), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(kernel, num_chunks=W // CHUNK),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((H2, W), jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * 128 * 128 * W * (H2 // PANEL),
                bytes_accessed=2 * H2 * W, transcendentals=0),
        )(view, jnp.asarray(_row_basis_np()).astype(jnp.bfloat16),
          jnp.asarray(_col_basis_np()).astype(jnp.bfloat16),
          _q_big(scales))

    report("mode32 + in-kernel u8 transpose", slope(checksum(run)))


def exp_concat16():
    from experiments.exp_r2_layout import exp_concat16 as e
    e()


EXPS = {"flatcast": exp_flatcast, "permcast": exp_permcast,
        "ktranspose": exp_ktranspose, "concat16": exp_concat16}

if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPS)
    print("device:", jax.devices()[0].device_kind, flush=True)
    for n in names:
        t0 = time.time()
        try:
            EXPS[n]()
        except Exception as e:
            print(f"{n}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        print(f"[{n} took {time.time()-t0:.0f}s total]", flush=True)
