"""Stereo decode: fix the unaligned-minor-dim DMA pathology (round 4).

Cost attribution (exp_r12) found the interleaved stereo decode's wall
is NOT the byte reassembly (~20-35 us) but the INPUT BLOCK DMA: the
(64, 32, 960) block has 2048 rows of 960 B (7.5 u8 lane-tiles), and the
pad-absorbing writes cost ~70-90 us/frame — a morph test showed the
same kernel with a (64, 32, 1024) block (MORE bytes, aligned) runs 151
-> 80 us.

Fix (zero extra passes): merge strip-PAIRS into rows via a pure
reshape — (64, S, 2, BW) -> (64, S/2, 4*BW) whose 1920-byte minor dim
is exactly 15 lane-tiles.  Each patch load splits into an even-strip
and an odd-strip (8, w16) load at lane offsets sp*960 + view*480 +
base*16; the strips land in a_scr as evens-then-odds, and the row
basis constant absorbs the permutation (bmat rows reordered per
u-band) — the same free-design-parameter trick as the scalar u' and
stereo zip bases.  Requires S % 2 == 0 (falls back to the shipping
kernel otherwise).

Run: python experiments/exp_r13_dec_stereo_pairrows.py [interpret]
(HALVES=2|4 picks the block height; V=full|loads|mm attribution stubs;
interpret requires HALVES=2)

VERDICT (round 4, measured on chip): NEGATIVE across every
formulation.  The pair-merged (64, S/2, 1920) reshape does fix the raw
block DMA (copy probe: 28 us vs 85 us for the (64,32,960) shape,
1121 vs 368 GB/s r+w), but every kernel that CONSUMES the layout
lands at ~240-250 us vs the shipping 133-155:

  v1  per-(h,sp) 8-row masked loads/stores            ~251
  v2  hoisted full-dim loads + 8-row masked stores    ~246
  v3  mixed-half a_scr(256), f32 8-row slices         ~242
  v4  halves=4, dim1=32 full-tile loads AND stores    ~250
  v4 + aligned offsets / qi-broadcast micro-variants  ~242-251

Attribution inside v4 (loads-only ~225, matmuls-only ~229, full ~250)
shows no single dominating stage: the ~100 us regression is spread
across the consumption of the pair-merged rows (sublane re-packing of
u8 values whose strip pairs must be split back apart somewhere —
loads, scratch stores, or f32 slice-concats all pay it).  The
half<->strip-pair split is the same byte movement the zip matmul does
for the ENCODE direction, but on decode there is no whole-stream XLA
pass to delete, so every variant is pure added cost.

The shipping masked-load kernel stands.  The DMA probe result is
real and stands on its own: u8 blocks whose minor dim is not a
lane-tile multiple (480/960) DMA at ~1/3 speed — future formats
should pick 128-multiple minor dims (see the 420 record layout,
which already does).
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
from simd_dct_tpu.core.quantize import default_quant_lut, dequant_scales

H2, W = 2048, 3840


@functools.lru_cache(maxsize=None)
def _row_basis_mixed_np() -> np.ndarray:
    """Row basis with rows ordered (u, sp, j): strip m = 2*j + sp."""
    b = PK._row_basis_np()
    perm = np.concatenate([
        np.asarray([u * 16 + 2 * j + sp for sp in range(2)
                    for j in range(8)]) for u in range(8)])
    return np.ascontiguousarray(b[perm])


def _stereo_q_tile_mixed(scales64):
    """(256,128) dequant tile for the mixed-half Z stack: rows
    (u, sp, j) — the value depends only on u, so each u-band of the
    (128,128) tile is repeated to 32 rows."""
    base = PK._stereo_q_tile(scales64)          # (128,128) rows (u,m)
    return base.reshape(8, 16, 128)[:, 0, :]          # (8,128)


def _dec_stereo_pairrows_kernel(in_ref, b_ref, a_ref, qi_ref, out_ref,
                                a_scr, b_scr, *, groups, dtype, halves):
    """v4 mixed-half, dim1 = 8*halves pair-rows (32 at halves=4: the
    in-block occupies FULL (32,128) u8 tiles, so the per-(u,v,sp)
    full-dim1 loads and the (8*halves)-row a_scr stores are unmasked).
    The half split happens on the f32 value after dequant (8-row f32
    slices are tile-aligned); basis/qi constants absorb the row
    order."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    pr = 8 * halves           # pair-rows per block
    hw = 128 * halves
    import os as _os
    _variant = _os.environ.get("V", "full")

    for view in range(2):
        for base, size in groups:
            w16 = 16 * size
            if _variant != "mm":
                for u in range(8):
                    for v in range(8):
                        for sp in range(2):
                            _off = sp * 960 + view * 480 + base * 16
                            val = in_ref[u * 8 + v, :, pl.ds(_off, w16)]
                            a_scr[pl.ds(u * 2 * pr + sp * pr, pr),
                                  pl.ds(v * 128, w16)] = val
            if _variant == "full":
                for v in range(8):
                    t = a_scr[:, pl.ds(v * 128, 128)].T   # (128, 16*pr)
                    for i in range(size):
                        b_scr[pl.ds(v * 16, 16), pl.ds(i * hw, hw)] = \
                            t[i * 16:(i + 1) * 16, :]
            for i in range(size):
                c = base + i
                if _variant == "loads":
                    zq = a_scr[:, pl.ds((i % 8) * 128, 128)]
                else:
                    zq = b_scr[:, pl.ds(i * hw, hw)].T    # (16*pr, 128)
                # per-(u,sp) piece dequant with an (8,128) qi broadcast:
                # no (16pr,128) f32 constants or values stay live
                zfs = {}
                for u in range(8):
                    qrow = qi_big[u, :][None, :]
                    for sp in range(2):
                        pc = zq[u * 2 * pr + sp * pr:
                                u * 2 * pr + (sp + 1) * pr, :]
                        zfs[(u, sp)] = (
                            pc.astype(jnp.int32).astype(jnp.float32)
                            - 127.0) * qrow
                for h in range(halves):
                    z = jnp.concatenate(
                        [zfs[(u, sp)][h * 8:h * 8 + 8, :]
                         for u in range(8) for sp in range(2)],
                        axis=0).astype(dtype)          # (128,128)
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
def dec_stereo_pairrows(planar, inv_scales, interpret=False):
    _, s, _, bw = planar.shape
    assert s % 2 == 0 and bw == 480, "probe targets 4K-class geometry"
    h2, w = s * 8, bw * 8
    dtype = jnp.bfloat16
    halves = int(os.environ.get("HALVES", "4"))
    assert h2 % (PANEL * halves) == 0
    n_pg = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_dec_stereo_pairrows_kernel,
                               groups=PK._stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves)
    flat = planar.reshape(64, s // 2, 4 * bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pg,),
        in_specs=[pl.BlockSpec((64, 8 * halves, 4 * bw),
                               lambda pg: (0, pg, 0))] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0))] * 2 + [
            pl.BlockSpec((8, 128), lambda pg: (0, 0))],
        out_specs=pl.BlockSpec((2, PANEL * halves, w),
                               lambda pg: (0, pg, 0)),
        scratch_shapes=[pltpu.VMEM((128 * halves, 1024), jnp.uint8),
                        pltpu.VMEM((128, 1024 * halves), jnp.uint8)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * n_pg,
            bytes_accessed=4 * h2 * w, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, jnp.asarray(_row_basis_mixed_np()).astype(dtype),
      jnp.asarray(PK._stereo_col_basis_np()).astype(dtype),
      _stereo_q_tile_mixed(inv_scales))
    return out.reshape(2 * h2, w)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    lut = jnp.asarray(default_quant_lut(100))
    inv = dequant_scales(lut)
    rng = np.random.default_rng(11)
    s, bw = ((32, 480) if interpret else (H2 // 8, W // 8))
    rec = jnp.asarray(rng.integers(0, 256, (64, s, 2, bw), np.uint8))

    ship = np.asarray(PK._dec_stereo_panels(rec, inv, interpret=interpret))
    got = np.asarray(dec_stereo_pairrows(rec, inv, interpret=interpret))
    print("byte-exact vs shipping interleaved decode:",
          np.array_equal(got, ship), flush=True)
    if interpret:
        return

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    fns = {"ship": csum(lambda p: PK._dec_stereo_panels(p, inv)),
           "pairrows": csum(lambda p: dec_stereo_pairrows(p, inv))}
    bs = []
    for b in (4, 100):
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
            cyc[m].append((best[(m, 100)] - best[(m, 4)]) / 96 * 1e6)
    for m, v in cyc.items():
        print(f"dec_stereo {m}: median {statistics.median(v):.1f} us  "
              f"{[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
