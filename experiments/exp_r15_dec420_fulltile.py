"""420 decode: full-tile chroma blocks (round 4).

The shipping `_dec420_panels` feeds chroma record blocks as (16, 4W):
dim0=16 is HALF a u8 sublane tile, so the blocks pad 2x in VMEM and
every 16-row chroma gather is sub-tile masked (the same tax the pair
decoder killed with aligned-32 reads, round 3).  This probe doubles the
grid step: y (64, 8W), chroma (32, 4W) — chroma gathers become aligned
(32,128) reads + register slices, everything else per-sub-block
identical.  Needs the vmem limit raised (~17.7 MB of blocks).

Run: python experiments/exp_r15_dec420_fulltile.py [interpret]

VERDICT (round 4): byte-exact but NO measurable win — paired cycles
gave 103 vs 110 us (within spread) in one phase and a loss in a
high-variance phase.  The chroma blocks are only ~1/4 of the mode's
bytes, so the half-tile pad tax they pay is bounded by ~5-10 us —
inside the tunnel's noise floor.  Not shipped; the (16, 4W) chroma
blocks stay (they keep the VMEM footprint half of this variant's
~17.7 MB, which needs the raised vmem limit).
"""
import functools
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

import simd_dct_tpu.kernels.color420 as C420
from simd_dct_tpu.kernels.color420 import (_gather_tiles2, _chroma_dec_bases_np,
                                           _row_basis_np, _col_basis_np,
                                           _q_big, _YCC2RGB, _CB_BIAS, CHUNK)
from simd_dct_tpu.core.quantize import default_quant_lut, dequant_scales
from simd_dct_tpu.layout import BASE_CHROMA_QUANT_TABLE

H2, W = 2048, 3840


def _kernel(y_ref, cb_ref, cr_ref, b_ref, a_ref, bd_ref, ad_ref,
            qil_ref, qic_ref, out_ref, *, num_chunks: int, dtype):
    bmat = b_ref[...]
    amat = a_ref[...]
    bd = bd_ref[...]
    ad = ad_ref[...]
    qil = qil_ref[...]
    qic = qic_ref[...]

    def cchunk(cc, carry):
        # aligned (32,128) chroma reads covering BOTH sub-blocks
        ctiles = [_gather_tiles2(ref, cc) for ref in (cb_ref, cr_ref)]
        for sub in range(2):
            cys = []
            for ci in range(2):
                zb = ctiles[ci][sub]
                zq = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                      * qic).astype(dtype)
                cys.append(jnp.dot(zq, ad,
                                   preferred_element_type=jnp.float32)
                           .astype(dtype))
            ytiles = [_ytiles2_off(y_ref, sub, 2 * cc + j)
                      for j in range(2)]
            for h in range(2):
                cols = []
                for j in range(2):
                    zb = ytiles[j][h]
                    zq = ((zb.astype(jnp.int32).astype(jnp.float32)
                           - 127.0) * qil).astype(dtype)
                    y = jax.lax.dot_general(
                        zq, amat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(dtype)
                    cols.append(jax.lax.dot_general(
                        bmat, y, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                ylum = jnp.concatenate(cols, axis=1)
                ycc = [jax.lax.dot_general(
                    bd[:, h * 128:(h + 1) * 128], cy,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) - _CB_BIAS
                    for cy in cys]
                for ch in range(3):
                    m = _YCC2RGB[ch]
                    px = (ylum * np.float32(m[0])
                          + ycc[0] * np.float32(m[1])
                          + ycc[1] * np.float32(m[2]))
                    v = jnp.clip(jnp.rint(px), 0.0, 255.0)
                    out_ref[ch, pl.ds(sub * 256 + h * 128, 128),
                            pl.ds(cc * 2 * CHUNK, 2 * CHUNK)] = \
                        v.astype(jnp.int32).astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks // 2, cchunk, None, unroll=True)


def _ytiles2_off(ref, sub, c):
    """Aligned (32,128) luma reads at sub-block row offset sub*32."""
    gs = [(ref[pl.ds(sub * 32, 32), pl.ds(c * 1024 + k * 128, 128)],
           ref[pl.ds(sub * 32, 32), pl.ds(c * 1024 + 512 + k * 128, 128)])
          for k in range(4)]
    out = []
    for h in range(2):
        bands = []
        for g0f, g1f in gs:
            g0 = g0f[h * 16: h * 16 + 16, :]
            g1 = g1f[h * 16: h * 16 + 16, :]
            bands.append(jnp.concatenate([g0[:, :64], g1[:, :64]], axis=1))
            bands.append(jnp.concatenate([g0[:, 64:], g1[:, 64:]], axis=1))
        out.append(jnp.concatenate(bands, axis=0))
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec420_fulltile(y_rec, c_rec, luma, chroma, interpret=False):
    s, w8 = y_rec.shape
    w = w8 // 8
    assert w % (2 * CHUNK) == 0 and s % 4 == 0
    num_steps = s // 64
    dtype = jnp.bfloat16
    kernel = functools.partial(_kernel, num_chunks=w // CHUNK, dtype=dtype)
    bd, ad = _chroma_dec_bases_np()
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((64, 8 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 4 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(shape, lambda p: (0, 0),
                         memory_space=pltpu.VMEM)
            for shape in ((128, 128), (128, 128), (128, 256), (128, 256),
                          (128, 128), (128, 128))],
        out_specs=pl.BlockSpec((3, 512, w), lambda p: (0, p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, s * 8, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * 128 * 128 * w * 2 * num_steps * 2,
            bytes_accessed=(3 * s * 8 * w) + (3 * s * 8 * w) // 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y_rec, c_rec[0], c_rec[1],
      jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      jnp.asarray(bd).astype(dtype), jnp.asarray(ad).astype(dtype),
      _q_big(dequant_scales(luma)), _q_big(dequant_scales(chroma)))


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    chroma = jnp.asarray(BASE_CHROMA_QUANT_TABLE * 100.0 * 255.0)
    rng = np.random.default_rng(5)
    s, w = ((64, 256) if interpret else (H2 // 8, W))
    y = jnp.asarray(rng.integers(0, 256, (s, 8 * w), np.uint8))
    c = jnp.asarray(rng.integers(0, 256, (2, s // 2, 4 * w), np.uint8))

    ship = np.asarray(C420._dec420_panels(y, c, lut, chroma,
                                          interpret=interpret))
    got = np.asarray(dec420_fulltile(y, c, lut, chroma,
                                     interpret=interpret))
    print("byte-exact vs shipping 420 decode:",
          np.array_equal(got, ship), flush=True)
    if interpret:
        return

    def csum2(one):
        return jax.jit(lambda ys, cs: jnp.sum(jax.vmap(one)(ys, cs)
                                              .astype(jnp.int32)))

    fns = {"ship": csum2(lambda yy, cc: C420._dec420_panels(
               yy, cc, lut, chroma)),
           "fulltile": csum2(lambda yy, cc: dec420_fulltile(
               yy, cc, lut, chroma))}
    bs = []
    for b in (4, 44):
        yb = jnp.asarray(rng.integers(0, 256, (b, s, 8 * w), np.uint8))
        cb = jnp.asarray(rng.integers(0, 256, (b, 2, s // 2, 4 * w),
                                      np.uint8))
        jax.block_until_ready((yb, cb))
        bs.append((b, yb, cb))
    for f in fns.values():
        for _, yb, cb in bs:
            float(f(yb, cb))
    cyc = {m: [] for m in fns}
    for _ in range(6):
        best = {}
        for _ in range(6):
            for m, f in fns.items():
                for b, yb, cb in bs:
                    t0 = time.perf_counter()
                    float(f(yb, cb))
                    best[(m, b)] = min(best.get((m, b), 1e9),
                                       time.perf_counter() - t0)
        for m in fns:
            cyc[m].append((best[(m, 44)] - best[(m, 4)]) / 40 * 1e6)
    for m, v in cyc.items():
        print(f"dec420 {m}: median {statistics.median(v):.1f} us  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
