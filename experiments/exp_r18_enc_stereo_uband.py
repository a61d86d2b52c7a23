"""Round-5 probe C: per-u-band Z computation for the stereo encode.

exp_r17 showed batched plane stores don't move the 121-123 us native
stereo encode; the residual suspect is the piece ASSEMBLY, which has
two parts: (a) the 16-SUBLANE band extraction t[u*16:(u+1)*16, :]
from each (128,128) tile, and (b) the 16-LANE slice + concat across
the group's chunk tiles.  This probe removes (a): compute Z directly
per u-band as 8 (16,128) @ (128,128) matmuls (bmat row-slices), so
every piece is a lane slice of an already-16-row tensor.  Cost: the
M=16 matmuls underutilize the MXU pipeline vs one M=128 matmul —
this measures whether the assembly saving beats the matmul loss.

Variants:
  A: shipping kernel (full tile + sublane-band extraction)
  C: per-u-band matmuls (no sublane extraction)

RESULT (v5e, 2026-08-20, A/C walls adjacent in every rep): NEGATIVE —
A 125.2 us vs C 132.0 us, byte-equal outputs.  Removing the sublane
band extraction costs more in M=16 matmul underutilization than it
saves in assembly.  Together with exp_r17 (batched plane stores: a
wash) and exp_r16 (480- vs 512-minor stores: identical), the stereo
encode's ~121-125 us is bounded on all three suspect axes — the
plane-contiguous format's fragmentation cost is structural on this
part.
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
    bwp = PK.native_stereo_bwp(W)
    lut = default_quant_lut(100)
    scales = quant_scales(lut)
    halves = 2
    PANEL = PK.PANEL
    CHUNK = PK.CHUNK

    def kernel_c(xl_ref, xr_ref, b_ref, a_ref, q_ref, out_ref, *,
                 rounding, groups, dtype, pad_bw):
        bmat = b_ref[...]
        amat = a_ref[...]
        q_big = q_ref[...]
        last_base = groups[-1][0]
        for view, x_ref in ((0, xl_ref), (1, xr_ref)):
            for base, size in groups:
                # y tiles per chunk/half (the row-basis pass, unchanged)
                ys = [[None] * size for _ in range(halves)]
                for h in range(halves):
                    for i in range(size):
                        x = (x_ref[0, pl.ds(h * PANEL, PANEL),
                                   pl.ds((base + i) * CHUNK, CHUNK)]
                             .astype(jnp.int32).astype(jnp.float32)
                             * jnp.float32(1.0 / 255.0)).astype(dtype)
                        ys[h][i] = jnp.dot(
                            x, amat,
                            preferred_element_type=jnp.float32) \
                            .astype(dtype)
                for u in range(8):
                    bu = bmat[u * 16:(u + 1) * 16, :]       # (16, 128)
                    qu = q_big[u * 16:(u + 1) * 16, :]
                    # z for this u-band across halves: (16*halves, 128)
                    zs = [PK._quantize_tile(
                        jnp.dot(bu, ys[h][i],
                                preferred_element_type=jnp.float32) * qu,
                        rounding) for h in range(halves)
                        for i in range(size)]
                    # zs index = h*size + i
                    for v in range(8):
                        cols = [jnp.concatenate(
                            [zs[h * size + i][:, v * 16: v * 16 + 16]
                             for i in range(size)], axis=1)
                            for h in range(halves)]
                        piece = (cols[0] if halves == 1
                                 else jnp.concatenate(cols, axis=0))
                        width = 16 * size
                        if pad_bw and base == last_base:
                            piece = jnp.concatenate(
                                [piece, jnp.full((16 * halves, pad_bw),
                                                 127, jnp.uint8)], axis=1)
                            width += pad_bw
                        out_ref[view, u * 8 + v, :,
                                pl.ds(base * 16, width)] = piece

    @jax.jit
    def enc_c(img):
        h, w = img.shape
        h2 = h // 2
        n_pg = -(-h2 // (PANEL * halves))
        views = img.reshape(2, h2, w)
        kern = functools.partial(
            kernel_c, rounding="rne",
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

    img = jax.random.randint(jax.random.PRNGKey(0), (2 * H2, W), 0, 256,
                             dtype=jnp.int32).astype(jnp.uint8)
    ref = PK._enc_stereo_panels(img, scales, rounding="rne",
                                view_layout="native")
    got = enc_c(img)
    same = bool(jnp.array_equal(ref, got))
    print("variant C byte-equal to shipping native:", same, flush=True)
    if not same:
        diff = int(jnp.sum(ref != got))
        print("  mismatched bytes:", diff)
        if diff > 0.001 * ref.size:
            return

    bs_copy = dev((H2, W))
    bs_img = dev((2 * H2, W))
    fa = csum(lambda v: PK._enc_stereo_panels(
        v, scales, rounding="rne", view_layout="native"))
    fc = csum(enc_c)
    for f in (fa, fc):
        for _, xb in bs_img:
            float(f(xb))
    for _, xb in bs_copy:
        float(cp(xb))
    cyc = {"A": [], "C": [], "cp": []}
    for _ in range(6):
        best = {}
        for _ in range(8):
            for tag, g, bs in (("A", fa, bs_img), ("C", fc, bs_img),
                               ("cp", cp, bs_copy)):
                for bsz, xb in bs:
                    t0 = time.perf_counter()
                    float(g(xb))
                    best[(tag, bsz)] = min(
                        best.get((tag, bsz), 1e9),
                        time.perf_counter() - t0)
        for tag, bs in (("A", bs_img), ("C", bs_img), ("cp", bs_copy)):
            (b0, _), (b1, _) = bs
            cyc[tag].append(1e6 * (best[(tag, b1)] - best[(tag, b0)])
                            / (b1 - b0))
    for tag, name in (("A", "full-tile (shipping)"),
                      ("C", "per-u-band matmuls")):
        us = statistics.median(cyc[tag])
        frac = statistics.median(
            [2 * cc / mm for mm, cc in zip(cyc[tag], cyc["cp"])
             if mm > 0 and cc > 0])
        print(f"{tag} {name:22s} {us:7.1f} us  frac_of_copy {frac:.3f}  "
              f"cycles {[round(v, 1) for v in cyc[tag]]}", flush=True)
    print("copy cycles:", [round(v, 1) for v in cyc["cp"]])


if __name__ == "__main__":
    main()
