"""Interleaved stereo DECODE: kill the masked-load tax with a stage-0
sublane unzip matmul (round 4; the mirror of the encode-side zip win).

The reference interleaved stream reshaped (64, 2S, BW) has plane rows
2t+view (strip t, view v) — so the per-(h, view) plane-patch loads of
`_dec_stereo_kernel`'s interleaved branch hit view 1 at a BW lane
offset (not 128-aligned, masked loads, measured ~19-23 us/dual-view 4K
over the planar branch).  Instead: load each plane's WHOLE (32h, BW)
row block (every load 128-aligned), un-interleave its sublanes once
with the transposed zip matmul (0/1 s8 matrix, exact bytes mod 256 —
same argument as the encode zip / scalar Pi), park it in a VMEM
scratch, and run the planar branch's aligned pipeline from the scratch.

Cost: 64 (32h,32h)@(32h,BW) s8 matmuls per grid step (~25% of the main
matmul FLOPs at 2x int8 rate => ~12%); saving: every stage-1 load
aligned.

Run: python experiments/exp_r11_dec_stereo_unzip.py [interpret]

VERDICT (round 4, measured on chip): NEGATIVE, both variants —
byte-exact but slower than the shipping masked-load branch:

    ship (masked view-1 loads)       118-130 us / dual-view 4K
    variant 1 (stage-0 block unzip)  171-187 us  (2 MB scratch
                                     round-trip + 64 padded matmuls)
    variant 2 (fused per-piece unzip) ~205 us    (256 small
                                     (32h,32h)@(32h,w16) matmuls —
                                     MXU tile padding swamps the
                                     masked-load saving; the 4-way
                                     register row-slicing adds more)

Decode is the asymmetric direction: the ENCODE zip matmul wins
because it REPLACES a whole-stream XLA transpose dispatch (HBM
read+write), but on decode the alternative is only ~20 us of masked
loads, and every unzip formulation costs more than that.  The
shipping interleaved decode (masked loads, ~10-20% over planar) is
the floor; `view_layout='planar'` remains the fast path.
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
from simd_dct_tpu.core.quantize import (default_quant_lut, quant_scales,
                                        dequant_scales)

H2, W = 2048, 3840


def _unzipmat_np(halves: int) -> np.ndarray:
    """(32h, 32h) 0/1 un-zip: row view*16h + i <- interleaved row
    2i+view (the transpose of pallas_dct._zipmat_np)."""
    return PK._zipmat_np(halves).T.copy()


def _dec_stereo_ilv_kernel(in_ref, b_ref, a_ref, qi_ref, zu_ref,
                           out_ref, *a_scrs, groups, dtype, halves):
    """Variant 2 (VARIANT=fused): per (u,v,group), ONE aligned
    (32h, w16) load + unzip matmul feeding FOUR per-(h,view) a_scr
    buffers directly — no whole-block scratch round-trip."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    zu = zu_ref[...]
    rr = 32 * halves
    b_scr = a_scrs[-1]
    a_scrs = a_scrs[:-1]

    for base, size in groups:
        w16 = 16 * size
        for u in range(8):
            for v in range(8):
                blk = pltpu.bitcast(
                    in_ref[u * 8 + v, :, pl.ds(base * 16, w16)], jnp.int8)
                uz = (jax.lax.dot_general(
                    zu, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) & 255) \
                    .astype(jnp.uint8)
                for h in range(halves):
                    for view in range(2):
                        r0 = view * 16 * halves + h * 16
                        a_scrs[h * 2 + view][
                            pl.ds(u * 16, 16), pl.ds(v * 128, w16)] = \
                            uz[r0:r0 + 16, :]
        for h in range(halves):
            for view in range(2):
                a_scr = a_scrs[h * 2 + view]
                for v in range(8):
                    t = a_scr[:, pl.ds(v * 128, 128)].T
                    for i in range(size):
                        b_scr[pl.ds(v * 16, 16), pl.ds(i * 128, 128)] = \
                            t[i * 16:(i + 1) * 16, :]
                for i in range(size):
                    c = base + i
                    zq = b_scr[:, pl.ds(i * 128, 128)].T
                    z = ((zq.astype(jnp.int32).astype(jnp.float32) - 127.0)
                         * qi_big).astype(dtype)
                    y = jax.lax.dot_general(z, amat,
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp
                                            .float32).astype(dtype)
                    x = jax.lax.dot_general(bmat, y,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp
                                            .float32)
                    px = jnp.clip(jnp.rint(x * jnp.float32(255.0)),
                                  0.0, 255.0)
                    out_ref[view, pl.ds(h * PANEL, PANEL),
                            pl.ds(c * CHUNK, CHUNK)] = \
                        px.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec_stereo_unzip(planar, inv_scales, interpret=False):
    _, s, _, bw = planar.shape
    h2, w = s * 8, bw * 8
    dtype = jnp.bfloat16
    halves = 2 if h2 > PANEL else 1
    n_pg = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_dec_stereo_ilv_kernel,
                               groups=PK._stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves)
    flat = planar.reshape(64, 2 * s, bw)
    rr = 32 * halves
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pg,),
        in_specs=[pl.BlockSpec((64, rr, bw), lambda pg: (0, pg, 0))] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0))] * 3 + [
            pl.BlockSpec((rr, rr), lambda pg: (0, 0))],
        out_specs=pl.BlockSpec((2, PANEL * halves, w),
                               lambda pg: (0, pg, 0)),
        scratch_shapes=[pltpu.VMEM((128, 1024), jnp.uint8)
                        for _ in range(2 * halves + 1)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * n_pg,
            bytes_accessed=4 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(flat, jnp.asarray(PK._row_basis_np()).astype(dtype),
      jnp.asarray(PK._stereo_col_basis_np()).astype(dtype),
      PK._stereo_q_tile(inv_scales),
      jnp.asarray(_unzipmat_np(halves)))
    return out.reshape(2 * h2, w)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    lut = jnp.asarray(default_quant_lut(100))
    inv = dequant_scales(lut)
    rng = np.random.default_rng(11)
    s, bw = ((16, 64) if interpret else (H2 // 8, W // 8))
    rec = jnp.asarray(rng.integers(0, 256, (64, s, 2, bw), np.uint8))

    ship = np.asarray(PK._dec_stereo_panels(rec, inv, interpret=interpret))
    got = np.asarray(dec_stereo_unzip(rec, inv, interpret=interpret))
    print("byte-exact vs shipping interleaved decode:",
          np.array_equal(got, ship), flush=True)
    # unaligned S (final partial panel via edge masking)
    s2 = s - 1
    rec2 = jnp.asarray(rng.integers(0, 256, (64, s2, 2, bw), np.uint8))
    ship2 = np.asarray(PK._dec_stereo_panels(rec2, inv, interpret=interpret))
    got2 = np.asarray(dec_stereo_unzip(rec2, inv, interpret=interpret))
    print("unaligned-S byte-exact:", np.array_equal(got2, ship2), flush=True)
    if interpret:
        return

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    fns = {"ship": csum(lambda p: PK._dec_stereo_panels(p, inv)),
           "unzip": csum(lambda p: dec_stereo_unzip(p, inv))}
    bs = []
    for b in (2, 18):
        xb = jnp.asarray(rng.integers(0, 256, (b, 64, s, 2, bw), np.uint8))
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
            cyc[m].append((best[(m, 18)] - best[(m, 2)]) / 16 * 1e6)
    for m, v in cyc.items():
        print(f"dec_stereo {m}: median {statistics.median(v):.1f} us  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
