"""Scalar-layout Pi factorization probe (round-3 VERDICT next #9).

Round-2 proved the scalar byte order needs SOME runtime permutation
(u splits across the byte-in-word and column granularities for the
PAIR basis's u(half,q) mapping).  Round-4 insight: the u mapping is a
free design parameter of the row basis.  With ``u' = half*4 + q``:

    byte-in-word   u' & 3  == q        (exactly the bitcast position)
    word index     blk*16 + v*2 + half (scalar)
    pipeline word  half*16 + v*2 + blk (what the bitcast/transpose
                                        pipeline naturally produces)

so the scalar layout differs from the pipeline output by a PURE
4-byte-word lane permutation swapping (half <-> blk) — and that
permutation swaps only word pairs at constant distance 15 (odd low
words <-> even high words), i.e. TWO static 60-lane rolls + selects
per 128-lane cell piece.  No Pi matmul, no operand stacking, no
scratch stores.

This probe builds encode and decode kernels with the u'=half*4+q bases
and the roll fix-up, byte-checks them against the shipping scalar
kernels, and measures walls.

Run: python experiments/exp_r10_scalar_roll.py [interpret]
(FIXUP=slice|i32 picks the roll formulation)

VERDICT (round 4, measured on chip): NEGATIVE — both formulations are
byte-exact but SLOWER than the shipping s8 Pi matmul:

    enc ship 71-76 us   roll/slice 103 us   roll/i32 134 us
    dec ship 78-83 us   roll/slice 113 us   roll/i32 139 us

Mosaic has no i8 lane rotate, so the "two static rolls" must be paid
either as lane-slice concats at offsets 60/68 (masked sub-tile copies
on every piece, ~2x the swap's true cost) or as an i32
extend/rotate/truncate (conversion chains on 4x the register volume).
Both lose to ONE s8 MXU matmul that moves every byte at 2x MXU rate
with no conversions.  The scalar-layout Pi floor is real: any
formulation of the half<->blk word swap must move every byte of the
stream through the VPU at least once, and the VPU byte-move cost
exceeds the s8 MXU's; closes round-3 VERDICT #9.
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
from simd_dct_tpu.core.dct import dct_basis_np
from simd_dct_tpu.core.quantize import (default_quant_lut, quant_scales,
                                        dequant_scales)

H2, W = 2048, 3840


@functools.lru_cache(maxsize=None)
def scalar_row_basis_np() -> np.ndarray:
    """B rows (half, m, q) applying D[half*4 + q]."""
    d = dct_basis_np("float32")
    b = np.zeros((128, 128), np.float32)
    for half in range(2):
        for m in range(16):
            for q in range(4):
                b[half * 64 + m * 4 + q, m * 8: m * 8 + 8] = \
                    d[half * 4 + q]
    return b


@functools.lru_cache(maxsize=None)
def scalar_q_index() -> np.ndarray:
    idx = np.zeros((128, 128), np.int32)
    for half in range(2):
        for qq in range(4):
            u = half * 4 + qq
            rows = half * 64 + np.arange(16) * 4 + qq
            for cell in range(8):
                for v in range(8):
                    for blk in range(2):
                        idx[rows, cell * 16 + v * 2 + blk] = v * 8 + u
    return idx


def scalar_q_tile(scales64) -> jax.Array:
    s = jnp.asarray(scales64, jnp.float32).reshape(64)
    return jnp.take(s, jnp.asarray(scalar_q_index()))


FIXUP_VARIANT = os.environ.get("FIXUP", "slice")


def _fixup(piece):
    """Apply the (half <-> blk) word swap to a (rows, 128) u8 piece:
    word w = lane>>2; high-half even-offset words receive from w-15,
    low-half odd words from w+15, the rest are identity.  Masks come
    from an in-kernel iota (captured host constants are not allowed).

    Mosaic has no i8 lane rotate ("Rotate with non-32-bit data"), so
    the roll is expressed either as two lane-slice concats (variant
    'slice') or as an i32-extended rotate (variant 'i32')."""
    lane = jax.lax.broadcasted_iota(jnp.int32, piece.shape, 1)
    w = lane >> 2
    ma = (w >= 16) & ((w & 1) == 0)
    mb = (w < 16) & ((w & 1) == 1)
    if FIXUP_VARIANT == "i32":
        p32 = piece.astype(jnp.int32)
        fwd = pltpu.roll(p32, 60, axis=1).astype(jnp.uint8)
        bwd = pltpu.roll(p32, 68, axis=1).astype(jnp.uint8)
    else:
        fwd = jnp.concatenate([piece[:, -60:], piece[:, :-60]], axis=1)
        bwd = jnp.concatenate([piece[:, -68:], piece[:, :-68]], axis=1)
    return jnp.where(ma, fwd, jnp.where(mb, bwd, piece))


def _enc_scalar_kernel(x_ref, b_ref, a_ref, q_ref, out_ref, *,
                       rounding, groups, dtype, halves):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]

    def compute_words(h, c):
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32)
             .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        zq = PK._quantize_tile(z * q_big, rounding)
        return pltpu.bitcast(zq, jnp.int32)

    for base, store_from in groups:
        bytes_ts = [pltpu.bitcast(jnp.concatenate(
            [compute_words(h, base + i) for i in range(4)], axis=0).T,
            jnp.uint8) for h in range(halves)]
        for cp in range(4):
            vts = [bt[cp * 128:(cp + 1) * 128, :].T for bt in bytes_ts]
            for cl in range(store_from, 4):
                c = base + cl
                for cellbit in range(2):
                    cell = 2 * cp + cellbit
                    parts = []
                    for vt in vts:
                        lo = vt[cl * 32: cl * 32 + 16,
                                cellbit * 64: cellbit * 64 + 64]
                        hi = vt[cl * 32 + 16: cl * 32 + 32,
                                cellbit * 64: cellbit * 64 + 64]
                        parts.append(jnp.concatenate([lo, hi], axis=1))
                    piece = (parts[0] if halves == 1
                             else jnp.concatenate(parts, axis=0))
                    out_ref[:, pl.ds(c * 1024 + cell * 128, 128)] = \
                        _fixup(piece)


@functools.partial(jax.jit, static_argnames=("rounding", "interpret"))
def enc_scalar_roll(view, scales, rounding="rne", interpret=False):
    h2, w = view.shape
    dtype = jnp.bfloat16
    halves = 4 if h2 % (PANEL * 4) == 0 else (2 if h2 > PANEL else 1)
    num_steps = -(-h2 // (PANEL * halves))
    kernel = functools.partial(_enc_scalar_kernel, rounding=rounding,
                               groups=PK._pair_groups(w // CHUNK),
                               dtype=dtype, halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(view, jnp.asarray(scalar_row_basis_np()).astype(dtype),
      jnp.asarray(PK._pair_col_basis_np()).astype(dtype),
      scalar_q_tile(scales))


def _dec_scalar_kernel(rec_ref, b_ref, a_ref, qi_ref, out_ref,
                       s128_ref, u8t_ref, *, groups, dtype, halves):
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    rr = 16 * halves

    for base, _ in groups:
        for cp in range(4):
            raw = [(rec_ref[pl.ds(0, rr),
                            pl.ds((base + cl) * 1024 + (2 * cp) * 128, 128)],
                    rec_ref[pl.ds(0, rr),
                            pl.ds((base + cl) * 1024 + (2 * cp + 1) * 128,
                                  128)])
                   for cl in range(4)]
            for h in range(halves):
                for cl in range(4):
                    p0 = _fixup(raw[cl][0])[h * 16: h * 16 + 16, :]
                    p1 = _fixup(raw[cl][1])[h * 16: h * 16 + 16, :]
                    k = 2 * cl
                    s128_ref[pl.ds(k * 16, 16), pl.ds(0, 64)] = p0[:, :64]
                    s128_ref[pl.ds(k * 16, 16), pl.ds(64, 64)] = p1[:, :64]
                    s128_ref[pl.ds((k + 1) * 16, 16), pl.ds(0, 64)] = \
                        p0[:, 64:]
                    s128_ref[pl.ds((k + 1) * 16, 16), pl.ds(64, 64)] = \
                        p1[:, 64:]
                u8t_ref[pl.ds(h * 512 + cp * 128, 128), :] = s128_ref[...].T
        for h in range(halves):
            t = pltpu.bitcast(u8t_ref[pl.ds(h * 512, 512), :], jnp.int32)
            pp = t.T
            for cl in range(4):
                c = base + cl
                zq = pltpu.bitcast(pp[cl * 32:(cl + 1) * 32, :], jnp.uint8)
                z = ((zq.astype(jnp.int32).astype(jnp.float32) - 127.0)
                     * qi_big).astype(dtype)
                y = jax.lax.dot_general(z, amat, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) \
                    .astype(dtype)
                x = jax.lax.dot_general(bmat, y, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                px = jnp.clip(jnp.rint(x * jnp.float32(255.0)), 0.0, 255.0)
                out_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)] = \
                    px.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec_scalar_roll(records, inv_scales, interpret=False):
    s, w8 = records.shape
    w = w8 // 8
    h2 = s * 8
    dtype = jnp.bfloat16
    halves = 4 if h2 % (PANEL * 4) == 0 else (2 if h2 > PANEL else 1)
    kernel = functools.partial(_dec_scalar_kernel,
                               groups=PK._pair_groups(w // CHUNK),
                               dtype=dtype, halves=halves)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(-(-h2 // (PANEL * halves)),),
        in_specs=[pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0))] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0))] * 3,
        out_specs=pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0)),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.uint8),
                        pltpu.VMEM((512 * halves, 128), jnp.uint8)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(records, jnp.asarray(scalar_row_basis_np()).astype(dtype),
      jnp.asarray(PK._pair_col_basis_np()).astype(dtype),
      scalar_q_tile(inv_scales))


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    lut = jnp.asarray(default_quant_lut(100))
    scales = quant_scales(lut)
    inv = dequant_scales(lut)
    rng = np.random.default_rng(5)
    h2, w = (256, 512) if interpret else (H2, W)
    img = jnp.asarray(rng.integers(0, 256, (h2, w), np.uint8))

    ship = np.asarray(PK._encq_pair_panels(img, scales, rounding="rne",
                                           scalar_pi=True,
                                           interpret=interpret))
    got = np.asarray(enc_scalar_roll(img, scales, interpret=interpret))
    print("enc byte-exact vs shipping scalar:",
          np.array_equal(got, ship), flush=True)
    dec_ship = np.asarray(PK._decq_pair_panels(jnp.asarray(ship), inv,
                                               scalar_pi=True,
                                               interpret=interpret))
    dec_got = np.asarray(dec_scalar_roll(jnp.asarray(ship), inv,
                                         interpret=interpret))
    print("dec byte-exact vs shipping scalar:",
          np.array_equal(dec_got, dec_ship), flush=True)
    if interpret:
        return

    def batches(shape, sizes=(8, 264)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b,) + shape, 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(jax.vmap(one)(xs)
                                          .astype(jnp.int32)))

    for tag, shape, fns in (
        ("enc", (H2, W), {
            "ship": csum(lambda v: PK._encq_pair_panels(
                v, scales, rounding="rne", scalar_pi=True)),
            "roll": csum(lambda v: enc_scalar_roll(v, scales)),
            "pair": csum(lambda v: PK._encq_pair_panels(
                v, scales, rounding="rne"))}),
        ("dec", (H2 // 8, 8 * W), {
            "ship": csum(lambda r: PK._decq_pair_panels(
                r, inv, scalar_pi=True)),
            "roll": csum(lambda r: dec_scalar_roll(r, inv)),
            "pair": csum(lambda r: PK._decq_pair_panels(r, inv))}),
    ):
        bs = batches(shape)
        for f in fns.values():
            for _, xb in bs:
                float(f(xb))
        cyc = {m: [] for m in fns}
        for _ in range(6):
            best = {}
            for _ in range(8):
                for m, f in fns.items():
                    for bsz, xb in bs:
                        t0 = time.perf_counter()
                        float(f(xb))
                        best[(m, bsz)] = min(best.get((m, bsz), 1e9),
                                             time.perf_counter() - t0)
            (b0, _), (b1, _) = bs
            for m in fns:
                cyc[m].append((best[(m, b1)] - best[(m, b0)])
                              / (b1 - b0) * 1e6)
        for m, v in cyc.items():
            med = statistics.median([x for x in v if x > 0]
                                    or [float("nan")])
            print(f"{tag} {m}: {med:.1f} us/4K  "
                  f"{[round(x, 1) for x in v]}", flush=True)
        del bs


if __name__ == "__main__":
    main()
