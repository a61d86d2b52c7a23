"""Stereo interleaved ENCODE with an ALIGNED pair-merged out block
(round 4; applies the u8 DMA minor-dim lesson to the production side).

The shipping fused-interleave kernel writes a (64, 2S, BW) out block
whose BW=480-byte rows DMA at ~1/3 speed (docs/STATUS.md "u8 DMA
minor-dim lesson").  The SAME flat reference bytes are also a
(64, S/2, 4*BW) tensor whose 1920-byte rows are 15 full lane-tiles.
On the production side the strip-parity split costs NOTHING: the row
basis is free to emit each u-band's strips parity-major (B rows
(u, j): strip = 2j for j<8 else 2(j-8)+1), so the per-(u,v,view)
band's even/odd strips are CONTIGUOUS 8-row slices, and each
(view, parity) sub-piece is one full-height store at lane offset
sp*2*BW + view*BW + base*16.  No zip matmul, no epilogue, identical
bytes.  halves=4 keeps the out dim1 at 32 (full u8 sublane tiles);
needs the vmem limit raised (~15.7 MB of blocks).

Run: python experiments/exp_r14_enc_stereo_pairout.py [interpret]

VERDICT (round 4, measured on chip): NEGATIVE — byte-exact but ~2x
SLOWER than the shipping zip-matmul kernel (299 vs 151 us/dual-view 4K
in the same cycles; planar 118).  Same outcome as every decode-side
formulation (exp_r13): although the pair-merged (64, S/2, 1920) block
DMAs 3x faster in a pure copy probe, the in-kernel accesses that
produce it — (8*halves, w16) stores at lane offsets view*480 + sp*960
that straddle lane-tiles inside 15-tile rows — cost far more than the
DMA saves.  The lesson is symmetric and final: with the reference's
480-byte plane-row format, neither production nor consumption of a
re-blocked aligned view wins; the shipping kernels (zip matmul on
encode, masked loads on decode) are the measured floor, and the walls
are a property of the byte format, not the kernels.
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

import simd_dct_tpu.kernels.pallas_dct as PK
from simd_dct_tpu.kernels.pallas_dct import PANEL, CHUNK
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

H, W = 4096, 3840


@functools.lru_cache(maxsize=None)
def _row_basis_paritymajor_np() -> np.ndarray:
    """row_basis_np with each u-band's strip rows parity-major:
    row u*16 + j applies strip m = 2j (j < 8) else 2(j-8)+1."""
    from simd_dct_tpu.kernels.panel import row_basis_np
    b = row_basis_np()
    perm = np.concatenate([
        np.asarray([u * 16 + (2 * j if j < 8 else 2 * (j - 8) + 1)
                    for j in range(16)]) for u in range(8)])
    return np.ascontiguousarray(b[perm])


def _enc_stereo_pairout_kernel(xl_ref, xr_ref, b_ref, a_ref, q_ref,
                               out_ref, *, rounding, groups, dtype,
                               halves, bw):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]

    def compute_tile(x_ref, h, c):
        x = (x_ref[0, pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32)
             .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        return PK._quantize_tile(z * q_big, rounding)

    for base, size in groups:
        w16 = 16 * size
        tiles = {v: [[compute_tile(x_ref, h, base + i) for i in range(size)]
                     for h in range(halves)]
                 for v, x_ref in ((0, xl_ref), (1, xr_ref))}
        for u in range(8):
            for v in range(8):
                for view in range(2):
                    # (16, w16) bands, rows parity-major strips
                    bands = [jnp.concatenate(
                        [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                         for t in tiles[view][h]], axis=1)
                        for h in range(halves)]
                    for sp in range(2):
                        sub = jnp.concatenate(
                            [bd[sp * 8:(sp + 1) * 8, :] for bd in bands],
                            axis=0)                    # (8*halves, w16)
                        out_ref[u * 8 + v, :,
                                pl.ds(sp * 2 * bw + view * bw
                                      + base * 16, w16)] = sub


@functools.partial(jax.jit, static_argnames=("rounding", "interpret",
                                             "halves"))
def enc_stereo_pairout(img, scales, rounding="rne", interpret=False,
                       halves=4):
    h, w = img.shape
    h2, bw = h // 2, w // 8
    dtype = jnp.bfloat16
    assert h2 % (PANEL * halves) == 0 and w % CHUNK == 0
    n_pg = h2 // (PANEL * halves)
    views = img.reshape(2, h2, w)
    kernel = functools.partial(_enc_stereo_pairout_kernel,
                               rounding=rounding,
                               groups=PK._stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves, bw=bw)
    grid_spec = pl.GridSpec(
        grid=(n_pg,),
        in_specs=[
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (0, pg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (1, pg, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((64, 8 * halves, 4 * bw),
                               lambda pg: (0, pg, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((64, h2 // 16, 4 * bw), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * halves * n_pg,
            bytes_accessed=2 * h * w, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(views, views,
      jnp.asarray(_row_basis_paritymajor_np()).astype(dtype),
      jnp.asarray(PK._stereo_col_basis_np()).astype(dtype),
      PK._stereo_q_tile(scales))
    return out.reshape(64, h2 // 8, 2, bw)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    lut = jnp.asarray(default_quant_lut(100))
    scales = quant_scales(lut)
    rng = np.random.default_rng(11)
    h, w = (1024, 512) if interpret else (H, W)
    halves = 2 if interpret else 4
    img = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))

    ship = np.asarray(PK._enc_stereo_panels(img, scales, rounding="rne",
                                            interpret=interpret))
    got = np.asarray(enc_stereo_pairout(img, scales, interpret=interpret,
                                        halves=halves))
    print("byte-exact vs shipping fused interleave:",
          np.array_equal(got, ship.reshape(got.shape)), flush=True)
    if interpret:
        return

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    fns = {"ship": csum(lambda v: PK._enc_stereo_panels(
               v, scales, rounding="rne").reshape(-1)),
           "pairout": csum(lambda v: enc_stereo_pairout(
               v, scales).reshape(-1)),
           "planar": csum(lambda v: PK._enc_stereo_panels(
               v, scales, rounding="rne",
               view_layout="planar").reshape(-1))}
    bs = []
    for b in (4, 68):
        xb = jnp.asarray(rng.integers(0, 256, (b, h, w), np.uint8))
        xb.block_until_ready()
        bs.append((b, xb))
    for f in fns.values():
        for _, xb in bs:
            float(f(xb))
    cyc = {m: [] for m in fns}
    for _ in range(6):
        best = {}
        for _ in range(6):
            for m, f in fns.items():
                for b, xb in bs:
                    t0 = time.perf_counter()
                    float(f(xb))
                    best[(m, b)] = min(best.get((m, b), 1e9),
                                       time.perf_counter() - t0)
        for m in fns:
            cyc[m].append((best[(m, 68)] - best[(m, 4)]) / 64 * 1e6)
    for m, v in cyc.items():
        print(f"enc_stereo {m}: median {statistics.median(v):.1f} us  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
