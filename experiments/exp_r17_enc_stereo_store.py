"""Round-5 probe: batched plane stores for the native stereo ENCODE.

exp_r16 showed the native format fixes the DECODE wall (151 -> 89 us,
0.75x copy) but leaves ENCODE at 123 us — planar and native measure
IDENTICAL, so the encode store path is bound by per-store overhead
(512 small (32,128) stores per grid step), not by the DMA minor-dim
rule.  This probe batches the 8 v-planes of one u-band into a single
(8, 32, 128) store (64 stores per grid step instead of 512).

Variants:
  A: shipping kernel (per-(u,v) stores)            — baseline
  B: stacked store per (view, group, u)            — 8x fewer stores

RESULT (v5e, 2026-08-20, A/B walls adjacent in every rep): NEGATIVE —
A 122.7 us vs B 122.5 us, byte-equal outputs.  Batching the 8 v-planes
of a u-band into one (8, 32, 128) store changes nothing: the encode
wall is the (16,16)-granular piece ASSEMBLY (sublane-band slicing +
lane concat across chunk tiles), which both variants share, not store
issue count and not the store DMA (exp_r16: planar 480-minor and
native 512-minor time identical on encode).  With the plane-contiguous
format constraint this assembly is inherent to the kernel family; the
native format's DMA win is real only where DMA was the wall — the
DECODE side (151 -> 89 us, 0.75x copy, exp_r16).
"""

import functools
import statistics
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales
    from simd_dct_tpu.kernels import pallas_dct as PK

    H2, W = 2048, 3840
    bw = W // 8
    bwp = -(-bw // 128) * 128
    lut = default_quant_lut(100)
    scales = quant_scales(lut)
    halves = 2
    PANEL = PK.PANEL
    CHUNK = PK.CHUNK

    def kernel_b(xl_ref, xr_ref, b_ref, a_ref, q_ref, out_ref, *,
                 rounding, groups, dtype, pad_bw):
        bmat = b_ref[...]
        amat = a_ref[...]
        q_big = q_ref[...]
        last_base = groups[-1][0]
        for view, x_ref in ((0, xl_ref), (1, xr_ref)):
            for base, size in groups:
                tiles = [[PK._stereo_compute_tile(
                    x_ref, h, base + i, bmat, amat, q_big, rounding, dtype)
                    for i in range(size)] for h in range(halves)]
                for u in range(8):
                    planes = []
                    for v in range(8):
                        pieces = [jnp.concatenate(
                            [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                             for t in row], axis=1)
                            for row in tiles]
                        piece = jnp.concatenate(pieces, axis=0)
                        if pad_bw and base == last_base:
                            piece = jnp.concatenate(
                                [piece, jnp.full((16 * halves, pad_bw),
                                                 127, jnp.uint8)], axis=1)
                        planes.append(piece)
                    width = planes[0].shape[1]
                    out_ref[view, pl.ds(u * 8, 8), :,
                            pl.ds(base * 16, width)] = jnp.stack(planes)

    @functools.partial(jax.jit, static_argnames=())
    def enc_b(img):
        h, w = img.shape
        h2 = h // 2
        n_pg = -(-h2 // (PANEL * halves))
        views = img.reshape(2, h2, w)
        kern = functools.partial(
            kernel_b, rounding="rne",
            groups=PK._stereo_groups(w // CHUNK),
            dtype=jnp.bfloat16, pad_bw=bwp - bw)
        grid_spec = pl.GridSpec(
            grid=(n_pg,),
            in_specs=[
                pl.BlockSpec((1, PANEL * halves, w), lambda pg: (0, pg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PANEL * halves, w), lambda pg: (1, pg, 0),
                             memory_space=pltpu.VMEM)] + [
                pl.BlockSpec((128, 128), lambda pg: (0, 0),
                             memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((2, 64, 16 * halves, bwp),
                                   lambda pg: (0, 0, pg, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, 64, h2 // 8, bwp),
                                           jnp.uint8),
        )(views, views,
          jnp.asarray(PK._row_basis_np()).astype(jnp.bfloat16),
          jnp.asarray(PK._stereo_col_basis_np()).astype(jnp.bfloat16),
          PK._stereo_q_tile(scales))

    def dev(shape, sizes=(8, 136)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b,) + shape, 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(
            jax.vmap(one)(xs).astype(jnp.int32)))

    f1 = jax.jit(lambda xs: xs + jnp.uint8(1))
    f2 = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))
    cp = lambda xb: f2(f1(xb))  # noqa: E731

    # correctness first (vs the shipping native path)
    img = jax.random.randint(jax.random.PRNGKey(0), (2 * H2, W), 0, 256,
                             dtype=jnp.int32).astype(jnp.uint8)
    ref = PK._enc_stereo_panels(img, scales, rounding="rne",
                                view_layout="native")
    got = enc_b(img)
    same = bool(jnp.array_equal(ref, got))
    print("variant B byte-equal to shipping native:", same, flush=True)
    if not same:
        diff = int(jnp.sum(ref != got))
        print("  mismatched bytes:", diff)
        return

    bs_copy = dev((H2, W))
    bs_img = dev((2 * H2, W))

    def paired(f, batches, cycles=5, reps=8):
        for _, xb in batches:
            float(f(xb))
        for _, xb in bs_copy:
            float(cp(xb))
        m_cyc, c_cyc = [], []
        for _ in range(cycles):
            best = {}
            for _ in range(reps):
                for tag, g, bs in (("m", f, batches), ("c", cp, bs_copy)):
                    for bsz, xb in bs:
                        t0 = time.perf_counter()
                        float(g(xb))
                        best[(tag, bsz)] = min(
                            best.get((tag, bsz), 1e9),
                            time.perf_counter() - t0)
            (mb0, _), (mb1, _) = batches
            (cb0, _), (cb1, _) = bs_copy
            m_cyc.append(1e6 * (best[("m", mb1)] - best[("m", mb0)])
                         / (mb1 - mb0))
            c_cyc.append(1e6 * (best[("c", cb1)] - best[("c", cb0)])
                         / (cb1 - cb0))
        return m_cyc, c_cyc

    # A and B walls ADJACENT in every rep — the tunnel phase drift makes
    # sequential blocks incomparable (surface 25)
    fa = csum(lambda v: PK._enc_stereo_panels(
        v, scales, rounding="rne", view_layout="native"))
    fb = csum(enc_b)
    for f in (fa, fb):
        for _, xb in bs_img:
            float(f(xb))
    for _, xb in bs_copy:
        float(cp(xb))
    cyc = {"A": [], "B": [], "C": []}
    for _ in range(6):
        best = {}
        for _ in range(8):
            for tag, g, bs in (("A", fa, bs_img), ("B", fb, bs_img),
                               ("C", cp, bs_copy)):
                for bsz, xb in bs:
                    t0 = time.perf_counter()
                    float(g(xb))
                    best[(tag, bsz)] = min(
                        best.get((tag, bsz), 1e9),
                        time.perf_counter() - t0)
        for tag, bs in (("A", bs_img), ("B", bs_img), ("C", bs_copy)):
            (b0, _), (b1, _) = bs
            cyc[tag].append(1e6 * (best[(tag, b1)] - best[(tag, b0)])
                            / (b1 - b0))
    for tag, name in (("A", "per-(u,v) stores"),
                      ("B", "stacked-plane stores")):
        us = statistics.median(cyc[tag])
        frac = statistics.median(
            [2 * cc / mm for mm, cc in zip(cyc[tag], cyc["C"])
             if mm > 0 and cc > 0])
        print(f"{tag} {name:22s} {us:7.1f} us  frac_of_copy {frac:.3f}  "
              f"cycles {[round(v, 1) for v in cyc[tag]]}", flush=True)
    print("copy cycles:", [round(v, 1) for v in cyc["C"]])


if __name__ == "__main__":
    main()
