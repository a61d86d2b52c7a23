"""Round-2 perf experiments: in-kernel byte-record assembly candidates.

Measures on the real chip (slope method, checksum-scalar walls):
  1. baselines: mode32 fused, hybrid enc-quant, hybrid stereo per 4K frame
  2. toy kernel: 16-lane concat stores (stereo planar candidate A)
  3. toy kernel: i32 word packing via sublane bands (pair-cell candidate B)
  4. XLA bitcast i32->u8 relayout cost
Run: python experiments/exp_r2_layout.py [exp...]
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

H2, W = 2048, 3840
LOGICAL = H2 * W * 2


def slope(fn_builder, sizes=(8, 72), reps=6, tries=5):
    """per-frame seconds via batched slope, median of positive tries."""
    rng = np.random.default_rng(0)
    batches = {}
    for bsz in sizes:
        batches[bsz] = jnp.asarray(
            rng.integers(0, 256, (bsz, H2, W), dtype=np.uint8))
    jax.block_until_ready(list(batches.values()))
    vals = []
    for _ in range(tries):
        walls = {}
        for bsz in sizes:
            f = fn_builder()
            float(f(batches[bsz]))
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(batches[bsz]))
                best = min(best, time.perf_counter() - t0)
            walls[bsz] = best
        v = (walls[sizes[1]] - walls[sizes[0]]) / (sizes[1] - sizes[0])
        if v > 0:
            vals.append(v)
    return statistics.median(vals)


def report(name, per_frame_s):
    gbps = LOGICAL / per_frame_s / 1e9
    print(f"{name}: {per_frame_s*1e6:.1f} us/frame  {gbps:.0f} GB/s logical",
          flush=True)


def checksum(one):
    return lambda: jax.jit(
        lambda xs: jnp.sum(jax.vmap(one)(xs).astype(jnp.int64)))


def exp_baselines():
    from simd_dct_tpu.kernels import pallas_dct as PK
    from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    scales = quant_scales(lut)

    def enc32(v):
        return PK._enc32_panels(v, scales, normalize=False, rounding="rne",
                                precision="bf16")
    report("mode32 fused", slope(checksum(enc32)))

    def encq(v):
        # full hybrid enc-quant on a bare view (mimic api: tiles + permute)
        from simd_dct_tpu.kernels import panel as P
        tiles = PK._tiles_panels(v, scales, normalize=False, rounding="rne",
                                 orientation="fx", precision="bf16")
        return P.tiles_to_block_contiguous(tiles)
    report("hybrid enc-quant scalar", slope(checksum(encq)))

    def encq_pair(v):
        from simd_dct_tpu.kernels import panel as P
        tiles = PK._tiles_panels(v, scales, normalize=False, rounding="rne",
                                 orientation="fx", precision="bf16")
        return P.tiles_to_pair(tiles)
    report("hybrid enc-quant pair", slope(checksum(encq_pair)))

    def st(v):
        from simd_dct_tpu.kernels import panel as P
        tiles = PK._tiles_panels(v, scales, normalize=True, rounding="rne",
                                 orientation="fy", precision="bf16")
        return P.tiles_to_planar(tiles[None])
    report("hybrid stereo planar (1 view)", slope(checksum(st)))


def exp_concat16():
    """Toy: per chunk-octet, 64 stores of concat(8 x (16,16)) u8 slices —
    the stereo candidate-A store pattern, on top of real DCT compute."""
    from simd_dct_tpu.kernels.pallas_dct import (
        _row_basis_np, _col_basis_np, _q_big, _quantize_tile, PANEL, CHUNK)
    from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales
    scales = quant_scales(jnp.asarray(default_quant_lut(100) * 255.0))

    def kernel(x_ref, b_ref, a_ref, q_ref, out_ref, *, num_octets):
        bmat = b_ref[...]
        amat = a_ref[...]
        q_big = q_ref[...]

        def octet(o, carry):
            tiles = []
            for cc in range(8):
                x = (x_ref[:, pl.ds((o * 8 + cc) * CHUNK, CHUNK)]
                     .astype(jnp.int32).astype(jnp.float32)).astype(jnp.bfloat16)
                y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
                    .astype(jnp.bfloat16)
                z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
                tiles.append(_quantize_tile(z * q_big, "rne"))
            # planar assembly: per (u,v) one (16, 128) store built from
            # 8 chunks' 16-lane slices (col layout here is the mode32 one,
            # g*64+v*8+b — close enough for a cost measurement)
            for u in range(8):
                for v in range(8):
                    piece = jnp.concatenate(
                        [t[u * 16:(u + 1) * 16, v * 16:v * 16 + 16]
                         for t in tiles], axis=1)
                    out_ref[pl.ds((u * 8 + v) * 16, 16),
                            pl.ds(o * 128, 128)] = piece
            return carry

        jax.lax.fori_loop(0, num_octets, octet, None, unroll=True)

    num_octets = W // (8 * CHUNK)

    @jax.jit
    def run(view):
        grid_spec = pl.GridSpec(
            grid=(H2 // PANEL,),
            in_specs=[
                pl.BlockSpec((PANEL, W), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1024, W // 8), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(kernel, num_octets=num_octets),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((H2 // PANEL) * 1024, W // 8),
                                           jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * 128 * 128 * W * (H2 // PANEL),
                bytes_accessed=2 * H2 * W, transcendentals=0),
        )(view, jnp.asarray(_row_basis_np()).astype(jnp.bfloat16),
          jnp.asarray(_col_basis_np()).astype(jnp.bfloat16),
          _q_big(scales))

    report("concat16 planar stores", slope(checksum(run)))


def exp_pack32():
    """Toy: pair-cell i32 word packing — quantize to i32 (no u8 narrowing),
    pack 4 u-bands into one i32 word tile via shifts, store i32."""
    from simd_dct_tpu.kernels.pallas_dct import (
        _row_basis_np, _col_basis_np, _q_big, PANEL, CHUNK)
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
            v = jnp.clip(jnp.rint(z * q_big).astype(jnp.int32) + 127, 0, 255)
            # pack u-bands {0,1,4,5} and {2,3,6,7} into i32 words
            def band(u):
                return v[u * 16:(u + 1) * 16, :]
            h0 = (band(0) + (band(1) << 8) + (band(4) << 16)
                  + (band(5) << 24))
            h1 = (band(2) + (band(3) << 8) + (band(6) << 16)
                  + (band(7) << 24))
            out_ref[0:16, pl.ds(c * CHUNK, CHUNK)] = h0
            out_ref[16:32, pl.ds(c * CHUNK, CHUNK)] = h1
            return carry

        jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)

    @jax.jit
    def run(view):
        grid_spec = pl.GridSpec(
            grid=(H2 // PANEL,),
            in_specs=[
                pl.BlockSpec((PANEL, W), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((32, W), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(kernel, num_chunks=W // CHUNK),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((H2 // PANEL) * 32, W),
                                           jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * 128 * 128 * W * (H2 // PANEL),
                bytes_accessed=2 * H2 * W, transcendentals=0),
        )(view, jnp.asarray(_row_basis_np()).astype(jnp.bfloat16),
          jnp.asarray(_col_basis_np()).astype(jnp.bfloat16),
          _q_big(scales))

    report("pack32 i32-word stores", slope(checksum(run)))


def exp_bitcast():
    """XLA-side i32 -> u8 byte-stream relayout cost."""
    def one(v):
        w = (v[:, ::4].astype(jnp.int32) + 1)  # (H2, W/4) i32 stand-in
        b = jax.lax.bitcast_convert_type(w, jnp.uint8)   # (H2, W/4, 4)
        return b.reshape(H2, W)
    report("bitcast i32->u8 + reshape", slope(checksum(one)))


EXPS = {"baselines": exp_baselines, "concat16": exp_concat16,
        "pack32": exp_pack32, "bitcast": exp_bitcast}

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
