"""Fused Pallas TPU kernels — the speed-of-light tier.

Design (SURVEY.md §3.2: the TPU translation of the AVX-512 kernel's
"one register lane = one block" trick):

* The image is processed in 128-row panels (16 strips of 8 rows) and
  128-column chunks (2 groups of 8 blocks).  Both DCT passes are full
  (128,128) MXU matmuls against permuted block-diagonal basis matrices
  built from ``kron(I_16, D)`` — XLA's lowering of ``(...,8,8)`` einsums
  wastes 15/16 of every vreg (measured 0.7 GB/s vs 726 GB/s elementwise
  roofline on v5e); this formulation keeps the MXU fully fed.
* ALL output-layout permutations are folded into the constant basis
  matrices: the row basis ``B[u*16+m, :]`` and column basis
  ``A[:, g*64+v*8+b]`` are chosen so the quantized coefficient tile
  ``Z[u*16+m, g*64+v*8+b]`` maps onto the mode32 byte records
  (``record byte = g*512 + u*64 + v*8 + b``, src/simd_dct.cpp:2021-2025)
  through nothing but contiguous sublane slices concatenated into
  contiguous lane stores.  Mosaic supports no multi-dim u8 reshapes, so
  permute-by-constant is the whole game.
* Quantize + bias + clamp + u8 pack fuse in; the decode kernel inverts
  the same scheme (slices -> dequant -> transposed-basis matmuls).
* Mode coverage: all three modes (enc-quant scalar/pair, enc-quant32,
  stereo planar) encode AND decode fully in-kernel; unaligned
  geometries are served by the pad-and-slice coverage wrappers (see
  "geometry coverage" below), so every contract-valid size takes the
  fused path.  The hybrid tile kernels (_tiles_kernel/_detile_kernel)
  remain as the building blocks of kernels.panel's XLA tier glue.

Byte-compatible with the XLA/golden tiers up to the usual last-ulp
rounding-boundary flips (~1% of bytes, +-1).  MXU operands default to
bf16: measured byte-identical to the f32 variant on v5 hardware (the
default-precision f32 dot already runs as bf16 passes) at ~2.5x the
throughput.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dct import dct_basis_np
from ..core.quantize import quant_scales, dequant_scales

PANEL = 128          # rows per grid step = 16 strips
CHUNK = 128          # columns per inner step = 2 groups of 8 blocks


# The (128,128) permuted basis matrices and the quant tile are the SAME
# construction the XLA panel tier uses — one shared definition keeps the
# byte-compatibility contract between tiers by construction.
from .panel import row_basis_np as _row_basis_np          # noqa: E402
from .panel import col_basis_np as _col_basis_np          # noqa: E402


def _q_big(scales64: jax.Array, orientation: str = "fy") -> jax.Array:
    """(128,128) quant multiplier aligned with Z: [u*16+m, g*64+v*8+b]
    -> scales[p] with p = u*8+v ('fy', the mode32/stereo convention) or
    p = v*8+u ('fx', the enc-quant convention)."""
    from .panel import q_tile
    return q_tile(scales64, orientation)


def _quantize_tile(x, rounding):
    """f32 scaled coeffs -> u8 with reference rounding semantics."""
    if rounding == "rne":
        v = jnp.rint(x).astype(jnp.int32) + 127
        return jnp.clip(v, 0, 255).astype(jnp.uint8)
    if rounding == "clamp_first":
        return jnp.rint(jnp.clip(x + 127.0, 0.0, 255.0)) \
            .astype(jnp.int32).astype(jnp.uint8)
    # 'scalar' (roundf-based golden variant)
    v = jnp.clip(x / 255.0 + np.float32(127.0 / 255.0), 0.0, 1.0) * 255.0
    return jnp.floor(v + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _enc32_kernel(x_ref, b_ref, a_ref, q_ref, out_ref, *, normalize: bool,
                  rounding: str, num_chunks: int, dtype, halves: int = 2):
    # Up to two 128-row panels per grid step so the (32, 8W) record block
    # keeps u8 STORES min-tile aligned (paired 16-sublane pieces from the
    # two halves make one aligned 32-sublane store; same trick as the
    # decode kernel's loads).
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    scale = jnp.float32(1.0 / 255.0) if normalize else jnp.float32(1.0)

    def compute_tile(h, c):
        # u8 -> f32 (via i32: Mosaic has no direct u8->f32 cast).  With
        # dtype=bfloat16 the MXU operands are bf16 (raw 0..255 pixels are
        # exact in bf16's 8 significand bits; the f32->bf16 rounding of the
        # y intermediate costs ~2^-9 relative — measured ~1-2% of output
        # bytes flip by +-1 vs the f32 path, PSNR unchanged) at ~2.5x the
        # f32 MXU rate.
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32).astype(jnp.float32) * scale).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)                                         # row DCT
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)   # col DCT
        return _quantize_tile(z * q_big, rounding)

    def chunk(c, carry):
        tiles = [compute_tile(h, c) for h in range(halves)]
        # Z rows are u-major 16-sublane bands; the mode32 record for strip m
        # is [g*512 + u*64 + v*8 + b], i.e. per group g four 128-lane
        # stores, each the concat of two u-bands' 64-lane group slices —
        # stacked across the halves into one aligned store.
        for g in range(2):
            for k in range(4):
                pieces = [jnp.concatenate(
                    [t[(2 * k) * 16:(2 * k + 1) * 16, g * 64:(g + 1) * 64],
                     t[(2 * k + 1) * 16:(2 * k + 2) * 16,
                       g * 64:(g + 1) * 64]], axis=1) for t in tiles]
                piece = (pieces[0] if halves == 1
                         else jnp.concatenate(pieces, axis=0))
                out_ref[:, pl.ds(c * 1024 + g * 512 + k * 128, 128)] = piece
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "rounding",
                                             "interpret", "precision"))
def _enc32_panels(view: jax.Array, scales: jax.Array, *, normalize: bool,
                  rounding: str, interpret: bool = False,
                  precision: str = "bf16") -> jax.Array:
    """(H2, W) u8 view -> (S, 8W) u8 mode32 strip records.
    Requires W % 128 == 0; any H2 % 8 == 0 works — the grid is a ceiling
    division and the final partial panel relies on Mosaic's edge-block
    masking (pad rows read garbage, but the strip bases are block-
    diagonal per 8 rows so real strips never mix with pad rows, and the
    partial output block drops the pad strips' records)."""
    h2, w = view.shape
    assert h2 % 8 == 0 and w % CHUNK == 0
    # halves=4 when the panel count divides evenly: fewer grid steps and
    # wider (64, 8W) record stores measured ~12% faster at 4K
    # (experiments/exp_r6_enc32.py, byte-identical); other geometries
    # keep the proven 2/1-half forms.
    if h2 % (PANEL * 4) == 0:
        halves = 4
    else:
        halves = 2 if h2 > PANEL else 1
    num_steps = -(-h2 // (PANEL * halves))
    num_chunks = w // CHUNK
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    kernel = functools.partial(_enc32_kernel, normalize=normalize,
                               rounding=rounding, num_chunks=num_chunks,
                               dtype=dtype, halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(view, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype), _q_big(scales))


def _dec32_kernel(rec_ref, b_ref, a_ref, qi_ref, out_ref, *, normalize: bool,
                  num_chunks: int, dtype, halves: int = 2):
    # Up to two record-panels per grid step: a (32, 8W) record block keeps
    # u8 loads min-tile aligned (a (16, 8W) block pads to 32 sublanes and
    # doubles load traffic — measured ~11% slower); halves=1 covers
    # geometries with an odd panel count.
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    scale = jnp.float32(255.0) if normalize else jnp.float32(1.0)

    rr = 16 * halves

    def chunk(c, carry):
        # One ALIGNED (16*halves, 128) read per record group covers both
        # record panels (16-sublane sub-tile reads pay ~2x masking).
        gs = [(rec_ref[pl.ds(0, rr), pl.ds(c * 1024 + k * 128, 128)],
               rec_ref[pl.ds(0, rr), pl.ds(c * 1024 + 512 + k * 128, 128)])
              for k in range(4)]
        for h in range(halves):
            # Reassemble Z bytes from the record stream (inverse of the
            # encode stores): u-band rows from 64-lane halves.
            bands = []
            for g0f, g1f in gs:
                g0 = g0f[h * 16: h * 16 + 16, :]
                g1 = g1f[h * 16: h * 16 + 16, :]
                bands.append(jnp.concatenate([g0[:, :64], g1[:, :64]],
                                             axis=1))
                bands.append(jnp.concatenate([g0[:, 64:], g1[:, 64:]],
                                             axis=1))
            zb = jnp.concatenate(bands, axis=0)      # (128, 128) u8
            z = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
                 * qi_big).astype(dtype)
            # Invert the orthonormal (permuted) bases: X = B^T @ Z @ A^T.
            y = jax.lax.dot_general(z, amat, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                .astype(dtype)
            x = jax.lax.dot_general(bmat, y, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = jnp.clip(jnp.rint(x * scale), 0.0, 255.0)
            out_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)] = \
                v.astype(jnp.int32).astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "interpret",
                                             "precision"))
def _dec32_panels(records: jax.Array, qi: jax.Array, *, normalize: bool,
                  interpret: bool = False,
                  precision: str = "bf16") -> jax.Array:
    """(S, 8W) u8 mode32 records -> (H2, W) u8 view (any S; the final
    partial record block decodes garbage pad strips whose pixel rows the
    partial output block drops)."""
    s, w8 = records.shape
    w = w8 // 8
    assert w % CHUNK == 0
    halves = 2 if s > 16 else 1
    num_steps = -(-s // (16 * halves))
    num_chunks = w // CHUNK
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_dec32_kernel, normalize=normalize,
                               num_chunks=num_chunks, dtype=dtype,
                               halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s * 8, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * s * 8 * w, transcendentals=0),
        interpret=interpret,
    )(records, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype), _q_big(qi))


def _tiles_kernel(x_ref, b_ref, a_ref, q_ref, out_ref, *, normalize: bool,
                  rounding: str, num_chunks: int, dtype):
    """Quantized coefficient tiles in NATURAL Z layout (aligned stores);
    the mode-specific byte records are assembled by a cheap XLA permute
    outside (the hybrid path for modes whose byte layouts need
    lane-granular u8 interleaves Mosaic cannot lower)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    scale = jnp.float32(1.0 / 255.0) if normalize else jnp.float32(1.0)

    def chunk(c, carry):
        x = (x_ref[:, pl.ds(c * CHUNK, CHUNK)].astype(jnp.int32)
             .astype(jnp.float32) * scale).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        out_ref[:, pl.ds(c * CHUNK, CHUNK)] = _quantize_tile(z * q_big,
                                                             rounding)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "rounding",
                                             "orientation", "interpret",
                                             "precision"))
def _tiles_panels(view: jax.Array, scales: jax.Array, *, normalize: bool,
                  rounding: str, orientation: str,
                  interpret: bool = False,
                  precision: str = "bf16") -> jax.Array:
    """(H2, W) u8 -> (P, 128, NJ, 128) u8 quantized tiles
    (kernels.panel tile tensor layout: [u*16+m, g*64+v*8+b])."""
    h2, w = view.shape
    assert h2 % PANEL == 0 and w % CHUNK == 0
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_tiles_kernel, normalize=normalize,
                               rounding=rounding, num_chunks=w // CHUNK,
                               dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(h2 // PANEL,),
        in_specs=[
            pl.BlockSpec((PANEL, w), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PANEL, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(view, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(scales, orientation))
    return out.reshape(h2 // PANEL, PANEL, w // CHUNK, CHUNK)


def _detile_kernel(t_ref, b_ref, a_ref, qi_ref, out_ref, *, normalize: bool,
                   num_chunks: int, dtype):
    """Inverse of _tiles_kernel: quantized tiles -> pixels."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    scale = jnp.float32(255.0) if normalize else jnp.float32(1.0)

    def chunk(c, carry):
        zb = t_ref[:, pl.ds(c * CHUNK, CHUNK)]
        z = ((zb.astype(jnp.int32).astype(jnp.float32) - 127.0)
             * qi_big).astype(dtype)
        y = jax.lax.dot_general(z, amat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            .astype(dtype)
        x = jax.lax.dot_general(bmat, y, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        px = jnp.clip(jnp.rint(x * scale), 0.0, 255.0)
        out_ref[:, pl.ds(c * CHUNK, CHUNK)] = px.astype(jnp.int32) \
            .astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "orientation",
                                             "interpret", "precision"))
def _detile_panels(tiles: jax.Array, inv_scales: jax.Array, *,
                   normalize: bool, orientation: str,
                   interpret: bool = False,
                   precision: str = "bf16") -> jax.Array:
    """(P, 128, NJ, 128) u8 quantized tiles -> (H2, W) u8 pixels."""
    p, _, nj, _ = tiles.shape
    h2, w = p * PANEL, nj * CHUNK
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_detile_kernel, normalize=normalize,
                               num_chunks=nj, dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(p,),
        in_specs=[
            pl.BlockSpec((PANEL, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PANEL, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * p,
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(tiles.reshape(h2, w), jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(inv_scales, orientation))


def _roundtrip_kernel(x_ref, b_ref, a_ref, q_ref, qi_ref, out_ref, *,
                      normalize: bool, num_chunks: int, dtype,
                      hpanels: int = 1):
    """Fused encode->decode: DCT, quantize, dequantize, IDCT per chunk —
    the coefficient records never leave VMEM, so HBM traffic stays at
    2 u8 bytes/px (BASELINE config 4's fused DCT/quant/IDCT workload).

    Round-4 tuning (experiments/exp_r8_s8dct.py): the quantize keeps the
    grid value in f32 — ``clip(rint(z*q) + 127, 0, 255) - 127`` equals
    ``clip(rint(z*q), -127, 128)`` exactly, so the i32/bias round trip
    is dead work (byte-identical, measured).  ``hpanels`` packs several
    128-row panels into one grid step: fewer, larger DMAs measured ~20%
    faster at 4K (52 vs 65.6 us, paired cycles).  An s8 fixed-point
    basis variant measured SLOWER: v5e runs s8 and bf16 matmuls at the
    SAME MXU rate (exp_r8_mxu_rate.py), so int8 only pays where it
    deletes conversion chains (the Pi permutation), not in the DCT."""
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    qi_big = qi_ref[...]
    scale = jnp.float32(1.0 / 255.0) if normalize else jnp.float32(1.0)
    inv_scale = jnp.float32(255.0) if normalize else jnp.float32(1.0)

    def tile(h, c):
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32).astype(jnp.float32) * scale).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        # quantize to the biased byte grid, then straight back
        n = jnp.clip(jnp.rint(z * q_big), -127.0, 128.0)
        zq = (n * qi_big).astype(dtype)
        y2 = jax.lax.dot_general(zq, amat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            .astype(dtype)
        x2 = jax.lax.dot_general(bmat, y2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        px = jnp.clip(jnp.rint(x2 * inv_scale), 0.0, 255.0)
        out_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)] = \
            px.astype(jnp.int32).astype(jnp.uint8)

    def chunk(c, carry):
        for h in range(hpanels):
            tile(h, c)
        return carry

    jax.lax.fori_loop(0, num_chunks, chunk, None, unroll=True)


@functools.partial(jax.jit, static_argnames=("normalize", "interpret",
                                             "precision"))
def _roundtrip_panels(view: jax.Array, lut: jax.Array, *, normalize: bool,
                      interpret: bool = False,
                      precision: str = "bf16") -> jax.Array:
    """(H2, W) u8 -> (H2, W) u8: fused mode32 encode->decode round trip
    (any H2 % 8 == 0; final partial panel via edge-block masking)."""
    h2, w = view.shape
    assert h2 % 8 == 0 and w % CHUNK == 0
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # 512-row grid steps measured ~20% faster than 128 at 4K (fewer,
    # larger DMAs; exp_r8_s8dct.py); 1024 was marginal and sits at the
    # 16 MB scoped-VMEM edge once in/out double-buffer.  Gate on
    # DIVISIBILITY like the pair/scalar kernels: a magnitude-only gate
    # would compute up to ~88% pad rows at awkward heights like
    # h2=544 (review finding, round 4).
    if h2 % (4 * PANEL) == 0:
        hpanels = 4
    elif h2 % (2 * PANEL) == 0:
        hpanels = 2
    elif h2 > 2 * PANEL:
        # non-dividing: prefer the fewest padded rows per frame
        hpanels = min((1, 2, 4), key=lambda k: -(-h2 // (k * PANEL))
                      * k * PANEL - h2)
    else:
        hpanels = 2 if h2 > PANEL else 1
    rows = PANEL * hpanels
    kernel = functools.partial(_roundtrip_kernel, normalize=normalize,
                               num_chunks=w // CHUNK, dtype=dtype,
                               hpanels=hpanels)
    grid_spec = pl.GridSpec(
        grid=(-(-h2 // rows),),
        in_specs=[
            pl.BlockSpec((rows, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(view, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_col_basis_np()).astype(dtype),
      _q_big(quant_scales(lut)), _q_big(dequant_scales(lut)))


def roundtrip_quantize32(img, lut, interpret=False, precision="bf16"):
    """Fused mode32 encode->decode of the TOP view -> (H/2, W) u8."""
    h, w = img.shape
    h2 = h // 2
    wp = _ceil_to(w, CHUNK)
    out = _roundtrip_panels(_pad_view(img[:h2, :], h2, wp),
                            jnp.asarray(lut, jnp.float32),
                            normalize=False, interpret=interpret,
                            precision=precision)
    return out[:, :w] if wp != w else out


def supports(h: int, w: int) -> bool:
    """Zero-overhead Pallas geometry: no W padding needed, and any
    H2 % 8 == 0 rides the non-dividing grids directly.  Used by the
    sharded paths (dist/sharding.py), which call the panel kernels
    without the W pad-and-slice wrappers."""
    return h % 16 == 0 and w % CHUNK == 0


def supports_mode(mode: str, h: int, w: int) -> bool:
    """Per-mode Pallas geometry gate for api dispatch (≙ the per-kernel
    ISA requirements of the reference dispatch, src/simd_dct.cpp:78-127).

    Round 2: any geometry meeting the mode's byte contract is served —
    (PANEL, CHUNK)-aligned views hit the kernels directly, everything
    else goes through the pad-and-slice coverage wrappers below.  The
    mode32 family needs W % 64 == 0 (groups of 8 blocks,
    src/simd_dct.cpp:118); the pair-cell pipeline needs whole 2-block
    cells (W % 16); stereo planar needs only whole blocks."""
    if h <= 0 or w <= 0 or h % 16:
        return False
    if mode in ("enc_quant32", "dec_quant32", "roundtrip32"):
        return w % 64 == 0
    if mode in ("enc_quant", "dec_quant"):
        return w % 16 == 0
    if mode in ("enc_quant_stereo", "dec_quant_stereo"):
        return w % 8 == 0
    return False


# -- geometry coverage ------------------------------------------------------
#
# Two mechanisms serve every geometry the reference accepts:
#
# * H axis: the kernels use NON-DIVIDING grids (ceiling division).  The
#   final partial panel relies on Mosaic's edge-block masking — pad rows
#   read arbitrary bytes, but every basis matrix is block-diagonal per
#   8-row strip, so real strips never mix with pad rows, and the partial
#   output block drops the pad strips' records (verified on v5e
#   hardware: partial blocks compile and store correctly).  Zero extra
#   HBM traffic for any H2 % 8 == 0.
# * W axis (rare: W % 128 != 0, or W < 512 for the pair pipeline): the
#   view is zero-padded up to chunk alignment and the padded
#   groups/cells are sliced back out of the record stream.  Blocks never
#   straddle an 8-px boundary, so padding contributes only whole
#   trailing granules per strip (and zero record bytes decode into whole
#   padded blocks which the pixel slice drops).
#
# For aligned geometries every helper is a no-op, so the fast path is
# untouched.

def native_stereo_bwp(size_x: int) -> int:
    """Padded plane-row length (block columns) of the TPU-native stereo
    record format: the kernel's block-column count (W padded to the
    128-px chunk) rounded up to a 128-multiple minor dim (the u8 DMA
    alignment rule — docs/LESSONS.md).  The single definition shared by
    the api validation, the decode wrapper, and bench.py."""
    bw_k = _ceil_to(size_x, CHUNK) // 8
    return _ceil_to(bw_k, 128)


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_view(view: jax.Array, h2p: int, wp: int) -> jax.Array:
    """Zero-pad the trailing (rows, cols) axes of a (..., H2, W) view."""
    h2, w = view.shape[-2:]
    if (h2, w) == (h2p, wp):
        return view
    pad = [(0, 0)] * (view.ndim - 2) + [(0, h2p - h2), (0, wp - w)]
    return jnp.pad(view, pad)


def _slice_records(recs: jax.Array, s: int, w: int, unit: int,
                   sp: int, wp: int) -> jax.Array:
    """(..., Sp, 8*Wp) strip records -> (..., S, 8*W).  ``unit`` is the
    record granule in pixels (64 px = one 512-byte mode32 group, 16 px =
    one 128-byte pair cell); granules are x-major within a strip row, so
    the padded ones are a trailing slice at granule granularity."""
    if (sp, wp) == (s, w):
        return recs
    lead = recs.shape[:-2]
    r = recs.reshape(lead + (sp, wp // unit, 8 * unit))
    return r[..., :s, : w // unit, :].reshape(lead + (s, 8 * w))


def _pad_records(recs: jax.Array, s: int, w: int, unit: int,
                 sp: int, wp: int) -> jax.Array:
    """Inverse of _slice_records: zero-pad (..., S, 8*W) records to the
    padded geometry (zero bytes form whole padded blocks on decode)."""
    if (sp, wp) == (s, w):
        return recs
    lead = recs.shape[:-2]
    r = recs.reshape(lead + (s, w // unit, 8 * unit))
    pad = [(0, 0)] * (r.ndim - 3) + [(0, sp - s),
                                     (0, (wp - w) // unit), (0, 0)]
    return jnp.pad(r, pad).reshape(lead + (sp, 8 * wp))


def _mask_strips(records: jax.Array, start_y: int, end_y: int,
                 legacy_range: bool = False) -> jax.Array:
    s = np.arange(records.shape[0])
    cmp = s * 8 if legacy_range else s * 16
    mask = (cmp >= start_y) & (cmp <= end_y)
    if mask.all():
        return records
    return jnp.where(jnp.asarray(mask)[:, None], records, jnp.uint8(0))


# -- public mode entry points ----------------------------------------------

def encode_quantize32(img, lut, start_y=0, end_y=1 << 30, rounding="rne",
                      interpret=False, precision="bf16"):
    """Pallas fast path for simdDCT_EncodeQuantize32ReorderBuffer
    semantics (raw 0..255 domain, fy-major, coefficient-major groups).

    ``precision`` selects the MXU operand dtype.  Measured on v5: the
    'bf16' and 'f32' paths produce byte-identical outputs (Mosaic's
    default-precision f32 dot already computes through bf16 passes) while
    bf16 runs ~2.5x faster, so bf16 is the default; 'f32' is kept for
    platforms where the two could diverge."""
    h, w = img.shape
    h2 = h // 2
    wp = _ceil_to(w, CHUNK)   # H needs no padding: non-dividing grid
    records = _enc32_panels(_pad_view(img[:h2, :], h2, wp),
                            quant_scales(lut), normalize=False,
                            rounding=rounding, interpret=interpret,
                            precision=precision)
    records = _slice_records(records, h2 // 8, w, 64, h2 // 8, wp)
    return _mask_strips(records, start_y, end_y).reshape(-1)


def decode_quantize32(data, lut, size_x, size_y, interpret=False,
                      precision="bf16"):
    """Pallas fast path for the mode32 inverse (north-star decode)."""
    h2 = size_y // 2
    records = jnp.asarray(data).reshape(h2 // 8, 8 * size_x)
    wp = _ceil_to(size_x, CHUNK)
    records = _pad_records(records, h2 // 8, size_x, 64, h2 // 8, wp)
    out = _dec32_panels(records, dequant_scales(lut), normalize=False,
                        interpret=interpret, precision=precision)
    return out[:, :size_x] if wp != size_x else out


# -- fused enc-quant PAIR layout (the reference's flagship SIMD layout) ----
#
# The SSE4.1 enc-quant kernel ("most compliant and fastest",
# src/simd_dct.cpp:665-668,1540-1704) emits 128-byte two-block cells whose
# byte order interleaves the vertical frequency u at 1/2/4-byte granularity
# — not expressible as sublane-slice + lane-concat of any Z tile.  The
# round-2 pipeline assembles the exact bytes fully in-kernel:
#
#   1. bases reordered: B rows (half, m, q) with u = u(half, q) — the
#      cell's 4-byte words pack exactly the u-quads {0,1,4,5}/{2,3,6,7}
#      (the `q` offsets of src/simd_dct.cpp:1662-1670); A cols
#      (cell, v, blk).
#   2. bitcast u8->i32 merges each 4-row group into the cell WORDS
#      (Mosaic bitcast is sublane-major: i32[i,l] byte k = u8[4i+k,l]).
#   3. a 4-chunk row-stack + i32 transpose + i32->u8 bitcast turns word
#      indices into byte positions (rows become cell*64+v*8+blk*4+q).
#   4. per cell-pair, one u8 (128,128) transpose puts strips back on
#      sublanes; 64-lane slice + concat builds each cell's aligned
#      (16, 128) store.
#
# Measured on v5e: ~60 us / 4K frame (263 GB/s logical) vs 0.5-0.7 ms
# for the hybrid XLA permute — and in-kernel (128,128) transposes cost
# ~17 ns each, which is what makes the pipeline viable.

_U_OF_PAIR = {(0, 0): 0, (0, 1): 1, (0, 2): 4, (0, 3): 5,
              (1, 0): 2, (1, 1): 3, (1, 2): 6, (1, 3): 7}


@functools.lru_cache(maxsize=None)
def _pair_row_basis_np() -> np.ndarray:
    """B with rows (half, m, q): row half*64+m*4+q applies D[u(half,q)]."""
    d = dct_basis_np("float32")
    b = np.zeros((128, 128), np.float32)
    for half in range(2):
        for m in range(16):
            for q in range(4):
                b[half * 64 + m * 4 + q, m * 8: m * 8 + 8] = \
                    d[_U_OF_PAIR[half, q]]
    return b


@functools.lru_cache(maxsize=None)
def _pair_col_basis_np() -> np.ndarray:
    """A with cols (cell, v, blk): col cell*16+v*2+blk applies D[v] to
    block n = cell*2 + blk."""
    d = dct_basis_np("float32")
    a = np.zeros((128, 128), np.float32)
    for cell in range(8):
        for blk in range(2):
            n = cell * 2 + blk
            for v in range(8):
                a[n * 8: n * 8 + 8, cell * 16 + v * 2 + blk] = d[v]
    return a


@functools.lru_cache(maxsize=None)
def _pair_q_index() -> np.ndarray:
    """(128,128) LUT index p = v*8 + u per pair-basis Z tile position."""
    idx = np.zeros((128, 128), np.int32)
    for half in range(2):
        for qq in range(4):
            u = _U_OF_PAIR[half, qq]
            rows = half * 64 + np.arange(16) * 4 + qq
            for cell in range(8):
                for v in range(8):
                    for blk in range(2):
                        idx[rows, cell * 16 + v * 2 + blk] = v * 8 + u
    return idx


def _pair_q_tile(scales64) -> jax.Array:
    """(128,128) quant multiplier aligned with the pair-basis Z tile
    (fx-major LUT index p = v*8 + u); jit-traceable in ``scales64``."""
    s = jnp.asarray(scales64, jnp.float32).reshape(64)
    return jnp.take(s, jnp.asarray(_pair_q_index()))


def _pair_groups(num_chunks: int):
    """4-chunk groups covering [0, num_chunks); the final group may
    overlap its predecessor (recompute, store only the new chunks)."""
    groups, base = [], 0
    while base + 4 <= num_chunks:
        groups.append((base, 0))
        base += 4
    if base < num_chunks:
        b = num_chunks - 4
        groups.append((b, base - b))
    return tuple(groups)


@functools.lru_cache(maxsize=None)
def _scalar_from_pair_pi() -> np.ndarray:
    """(128,128) 0/1 matrix permuting one pair CELL's byte order into the
    scalar (block-contiguous) order: both cover the same two blocks, so
    scalar is a static intra-cell lane permutation of pair
    (dst blk*64+v*8+u  <-  src half*64+v*8+blk*4+q, u = u(half,q))."""
    pi = np.zeros((128, 128), np.float32)
    for half in range(2):
        for v in range(8):
            for blk in range(2):
                for q in range(4):
                    src = half * 64 + v * 8 + blk * 4 + q
                    dst = blk * 64 + v * 8 + _U_OF_PAIR[half, q]
                    pi[src, dst] = 1.0
    return pi


def _encq_pair_kernel(x_ref, b_ref, a_ref, q_ref, pi_ref, out_ref, *,
                      rounding: str, groups, as_written: bool,
                      scalar_pi: bool, dtype, halves: int = 2):
    # Up to two 128-row panels per grid step so the (32, 8W) record block
    # keeps u8 STORES min-tile aligned — paired 16-sublane pieces from
    # the two halves make one aligned 32-sublane store (the enc32 trick).
    # With a (16, 8W) block every store is a masked sub-tile store:
    # measured 60.6 vs 27.5 us / 4K frame (experiments/exp_r4_pair.py).
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    pi = pi_ref[...] if scalar_pi else None

    def compute_words(h, c):
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32)
             .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        zq = _quantize_tile(z * q_big, rounding)
        return pltpu.bitcast(zq, jnp.int32)              # (32, 128) words

    for base, store_from in groups:
        bytes_ts = [pltpu.bitcast(jnp.concatenate(
            [compute_words(h, base + i) for i in range(4)], axis=0).T,
            jnp.uint8) for h in range(halves)]           # (512, 128) each
        for cp in range(4):
            vts = [bt[cp * 128:(cp + 1) * 128, :].T      # u8 transpose
                   for bt in bytes_ts]
            pieces, offs = [], []
            for cl in range(store_from, 4):
                c = base + cl
                for cellbit in range(2):
                    cell = 2 * cp + cellbit
                    parts = []
                    for vt in vts:
                        lo = vt[cl * 32: cl * 32 + 16,
                                cellbit * 64: cellbit * 64 + 64]
                        if as_written:
                            # the as-coded overlapping store leaves every
                            # cell's second half unwritten (zero)
                            hi = jnp.zeros_like(lo)
                        else:
                            hi = vt[cl * 32 + 16: cl * 32 + 32,
                                    cellbit * 64: cellbit * 64 + 64]
                        parts.append(jnp.concatenate([lo, hi], axis=1))
                    pieces.append(parts[0] if halves == 1
                                  else jnp.concatenate(parts, axis=0))
                    offs.append(c * 1024 + cell * 128)
            if scalar_pi:
                # scalar layout: permute each cell's 128 lanes by the
                # static pair->scalar map — one exact s8 0/1 MXU matmul
                # on the stacked pieces: each output byte is exactly one
                # input byte mod 256, so bitcast u8->s8, accumulate s32,
                # mask & 255 (no u8->i32->bf16 / f32->i32->u8 chains;
                # measured 98.7 -> ~80 us/4K vs the bf16 form)
                stacked = pltpu.bitcast(jnp.concatenate(pieces, axis=0),
                                        jnp.int8)
                perm = (jax.lax.dot_general(
                    stacked, pi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                    & 255).astype(jnp.uint8)
                rows = 16 * halves
                pieces = [perm[i * rows:(i + 1) * rows, :]
                          for i in range(len(offs))]
            for piece, off in zip(pieces, offs):
                out_ref[:, pl.ds(off, 128)] = piece


@functools.partial(jax.jit, static_argnames=("rounding", "as_written",
                                             "scalar_pi", "interpret",
                                             "precision"))
def _encq_pair_panels(view: jax.Array, scales: jax.Array, *, rounding: str,
                      as_written: bool = False, scalar_pi: bool = False,
                      interpret: bool = False,
                      precision: str = "bf16") -> jax.Array:
    """(H2, W) u8 view -> (S, 8W) u8 strip records in the SIMD pair-cell
    layout (or, with scalar_pi, the block-contiguous scalar layout via a
    per-cell permutation matmul), fully in-kernel.  Requires
    W % 128 == 0 and W >= 512 (4-chunk transpose groups); any
    H2 % 8 == 0 (final partial panel via edge-block masking)."""
    h2, w = view.shape
    assert h2 % 8 == 0 and w % CHUNK == 0 and w >= 4 * CHUNK
    # halves=4 when the panel count divides: the scalar-layout Pi matmul
    # batches 64-row stacked operands (94 -> 71 us/4K) and the pair form
    # is neutral-to-better (round-4 /tmp probes, byte-identical)
    if h2 % (PANEL * 4) == 0:
        halves = 4
    else:
        halves = 2 if h2 > PANEL else 1
    num_steps = -(-h2 // (PANEL * halves))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(
        _encq_pair_kernel, rounding=rounding,
        groups=_pair_groups(w // CHUNK), as_written=as_written,
        scalar_pi=scalar_pi, dtype=dtype, halves=halves)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(view, jnp.asarray(_pair_row_basis_np()).astype(dtype),
      jnp.asarray(_pair_col_basis_np()).astype(dtype), _pair_q_tile(scales),
      jnp.asarray(_scalar_from_pair_pi().astype(np.int8)))


# -- fused enc-quant decode (inverse of the pair pipeline) -----------------

def _decq_pair_kernel(rec_ref, b_ref, a_ref, qi_ref, pi_ref, out_ref,
                      s128_ref, u8t_ref, pi_scr, *, groups, scalar_pi: bool,
                      dtype, halves: int = 1):
    """Assembly is done with VMEM scratch STORES, not jnp.concatenate
    trees: Mosaic lowers nested concats as repeated whole-tile copies
    (~7x slower than the equivalent sliced stores, measured).

    Up to two strip-panels per grid step (halves=2): a lone (16, 8W)
    record block sits below the (32, 128) u8 min tile, so its HBM->VMEM
    DMA pads every 16-sublane tile — pairing two strips makes the input
    block 32-sublane aligned (the same trick as the encode kernels)."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    pi_t = pi_ref[...] if scalar_pi else None
    rr = 16 * halves

    for base, _ in groups:
        for cp in range(4):
            # one ALIGNED (16*halves, 128) read per cell chunk covers both
            # strip panels at once (rows h*16..h*16+16 of the record block
            # belong to panel h) — per-h 16-sublane reads pay sub-tile
            # masking, the same ~2x tax as masked stores
            raw = [(rec_ref[pl.ds(0, rr),
                            pl.ds((base + cl) * 1024 + (2 * cp) * 128, 128)],
                    rec_ref[pl.ds(0, rr),
                            pl.ds((base + cl) * 1024 + (2 * cp + 1) * 128,
                                  128)])
                   for cl in range(4)]
            if scalar_pi:
                # scalar records -> pair cell order (inverse Π = Πᵀ) as an
                # exact s8 MXU matmul (see the encode kernel's scalar_pi
                # note), batched over all 4 chunks x both panels
                for cl, (v0, v1) in enumerate(raw):
                    pi_scr[pl.ds(cl * 2 * rr, rr), :] = v0
                    pi_scr[pl.ds(cl * 2 * rr + rr, rr), :] = v1
                stacked = pltpu.bitcast(pi_scr[...], jnp.int8)
                perm = (jax.lax.dot_general(
                    stacked, pi_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                    & 255).astype(jnp.uint8)
            for h in range(halves):
                for cl in range(4):
                    if scalar_pi:
                        p0 = perm[cl * 2 * rr + h * 16:
                                  cl * 2 * rr + h * 16 + 16, :]
                        p1 = perm[cl * 2 * rr + rr + h * 16:
                                  cl * 2 * rr + rr + h * 16 + 16, :]
                    else:
                        p0 = raw[cl][0][h * 16: h * 16 + 16, :]
                        p1 = raw[cl][1][h * 16: h * 16 + 16, :]
                    # band rows (c, half): [p0 half | p1 half]
                    k = 2 * cl
                    s128_ref[pl.ds(k * 16, 16), pl.ds(0, 64)] = p0[:, :64]
                    s128_ref[pl.ds(k * 16, 16), pl.ds(64, 64)] = p1[:, :64]
                    s128_ref[pl.ds((k + 1) * 16, 16), pl.ds(0, 64)] = \
                        p0[:, 64:]
                    s128_ref[pl.ds((k + 1) * 16, 16), pl.ds(64, 64)] = \
                        p1[:, 64:]
                u8t_ref[pl.ds(h * 512 + cp * 128, 128), :] = s128_ref[...].T
        for h in range(halves):
            t = pltpu.bitcast(u8t_ref[pl.ds(h * 512, 512), :],
                              jnp.int32)                 # (128, 128) words
            pp = t.T                                     # i32 transpose
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


@functools.partial(jax.jit, static_argnames=("scalar_pi", "interpret",
                                             "precision"))
def _decq_pair_panels(records: jax.Array, inv_scales: jax.Array, *,
                      scalar_pi: bool = False, interpret: bool = False,
                      precision: str = "bf16") -> jax.Array:
    """(S, 8W) u8 pair/scalar strip records -> (H2, W) u8 view, fully
    in-kernel (the exact inverse of _encq_pair_panels).

    The overlapping group decodes the overlapped chunks twice into the
    same pixels — idempotent, so no store masking is needed."""
    s, w8 = records.shape
    w = w8 // 8
    h2 = s * 8
    assert w % CHUNK == 0 and w >= 4 * CHUNK
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # halves=4 when the panel count divides (the inverse of the encode's
    # 4-half batching; dec_pair ~1.2x, dec_scalar ~1.25x, byte-identical)
    if h2 % (PANEL * 4) == 0:
        halves = 4
    elif h2 > PANEL:
        halves = 2
    else:
        halves = 1
    kernel = functools.partial(_decq_pair_kernel,
                               groups=_pair_groups(w // CHUNK),
                               scalar_pi=scalar_pi, dtype=dtype,
                               halves=halves)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(-(-h2 // (PANEL * halves)),),
        in_specs=[
            pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0))] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0))] * 4,
        out_specs=pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0)),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.uint8),
                        pltpu.VMEM((512 * halves, 128), jnp.uint8),
                        pltpu.VMEM((128 * halves, 128), jnp.uint8)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * (h2 // PANEL),
            bytes_accessed=2 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(records, jnp.asarray(_pair_row_basis_np()).astype(dtype),
      jnp.asarray(_pair_col_basis_np()).astype(dtype),
      _pair_q_tile(inv_scales),
      jnp.asarray(_scalar_from_pair_pi().astype(np.int8)))


# -- fused stereo decode (inverse of the plane-patch encode) ---------------

def _dec_stereo_kernel(in_ref, b_ref, a_ref, qi_ref, out_ref,
                       a_scr, b_scr, *, groups, dtype,
                       views_input: bool = False, halves: int = 1):
    """Z-tile reassembly straight from the planar byte stream — NO XLA
    prologue transpose (the previous version's (p,m)-interleave prologue
    alone cost ~100 us / 4K frame, ~40% of the total).  The planar
    tensor arrives as one (64, 16, 2*BW) block per strip panel (a pure
    reshape of the reference stream), so the per-plane patch rows are
    2-D slices of the 3-D ref; view 1's lane offset BW is not
    128-aligned, which Mosaic handles with masked loads (measured ~10%
    over the aligned-load kernel-only wall, far cheaper than the
    prologue it replaces):

      stage 1:  a_scr[u*16+m, v*128+(i,n)] = plane(u*8+v) patch rows
      stage 2:  per v: transpose a_scr v-block -> rows (i,n), (u,m);
                b_scr[v*16+n, i*128+(u,m)] = its chunk-i row slice
      stage 3:  per chunk i: b_scr i-block transposed = the (u,m)x(v,n)
                Z tile, exactly the layout the bases expect."""
    bmat = b_ref[...]
    amat = a_ref[...]
    qi_big = qi_ref[...]
    half = in_ref.shape[-1] if views_input else in_ref.shape[-1] // 2

    for h in range(halves):
        for view in range(2):
            for base, size in groups:
                w16 = 16 * size
                for u in range(8):
                    for v in range(8):
                        if views_input:
                            # separate-views block: every load starts at
                            # a 128-aligned lane offset
                            src = in_ref[view, u * 8 + v,
                                         pl.ds(h * 16, 16),
                                         pl.ds(base * 16, w16)]
                        else:
                            src = in_ref[u * 8 + v, pl.ds(h * 16, 16),
                                         pl.ds(view * half + base * 16,
                                               w16)]
                        a_scr[pl.ds(u * 16, 16), pl.ds(v * 128, w16)] = src
                for v in range(8):
                    t = a_scr[:, pl.ds(v * 128, 128)].T  # rows (i,n), (u,m)
                    for i in range(size):
                        b_scr[pl.ds(v * 16, 16), pl.ds(i * 128, 128)] = \
                            t[i * 16:(i + 1) * 16, :]
                for i in range(size):
                    c = base + i
                    zq = b_scr[:, pl.ds(i * 128, 128)].T  # (u,m) x (v,n)
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


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "true_bw"))
def _dec_stereo_panels(planar: jax.Array, inv_scales: jax.Array, *,
                       interpret: bool = False,
                       precision: str = "bf16",
                       true_bw: int | None = None) -> jax.Array:
    """(64, S, 2, BW) u8 planar tensor (reference interleaved layout) OR
    (2, 64, S, BW) separate-views tensor -> (H, W) u8 dual-view image
    (any S; final partial panel via edge-block masking).  The separate-
    views form reads every plane patch at a 128-aligned lane offset
    (the interleaved form's view-1 loads are masked, ~10% dearer).

    ``true_bw`` (native-format input, round 5): the tensor's minor dim
    is the 128-multiple padded BWP, but only the first ``true_bw``
    block columns carry data — the decode reads the padded planes at
    full DMA speed and simply never touches the pad lanes, writing the
    true-width image directly (no post-slice pass)."""
    views_input = planar.ndim == 4 and planar.shape[0] == 2 \
        and planar.shape[1] == 64
    if views_input:
        _, _, s, bw = planar.shape
    else:
        _, s, _, bw = planar.shape
    bw_in = bw
    if true_bw is not None:
        assert views_input and true_bw <= bw and true_bw % 16 == 0
        bw = true_bw
    h2, w = s * 8, bw * 8
    assert w % CHUNK == 0
    halves = 2 if h2 > PANEL else 1
    n_pg = -(-h2 // (PANEL * halves))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(_dec_stereo_kernel,
                               groups=_stereo_groups(w // CHUNK),
                               dtype=dtype, views_input=views_input,
                               halves=halves)
    if views_input:
        flat = planar
        in_spec = pl.BlockSpec((2, 64, 16 * halves, bw_in),
                               lambda pg: (0, 0, pg, 0))
    else:
        # pure reshape (no data movement): one (64, 16h, 2*BW) block/panel
        flat = planar.reshape(64, s, 2 * bw)
        in_spec = pl.BlockSpec((64, 16 * halves, 2 * bw),
                               lambda pg: (0, pg, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pg,),
        in_specs=[in_spec] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0))] * 3,
        out_specs=pl.BlockSpec((2, PANEL * halves, w),
                               lambda pg: (0, pg, 0)),
        scratch_shapes=[pltpu.VMEM((128, 1024), jnp.uint8),
                        pltpu.VMEM((128, 1024), jnp.uint8)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, h2, w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * n_pg,
            bytes_accessed=4 * h2 * w, transcendentals=0),
        interpret=interpret,
    )(flat, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_stereo_col_basis_np()).astype(dtype),
      _stereo_q_tile(inv_scales))
    return out.reshape(2 * h2, w)


# -- fused stereo coefficient-planar encode --------------------------------
#
# The stereo layout (64 planes, per strip BW left-view then BW right-view
# bytes, src/simd_dct.cpp:896-1103) IS Mosaic-friendly once the col basis
# orders chunk columns (v, n): plane (u,v)'s bytes for a chunk are then
# the contiguous (16-strip, 16-block) patch Z[u-band, v*16:v*16+16], and
# eight chunks' patches lane-concat into one aligned (16, 128) store.
# The outputs are per-view (64, S, BW) 3-D blocks (plane-major via the
# BlockSpec, every store 128-aligned); one jnp.stack interleaves the
# views outside.  Measured ~150-200 us / 4K frame honest-materialized —
# ~3x the hybrid XLA permute path.

@functools.lru_cache(maxsize=None)
def _stereo_col_basis_np() -> np.ndarray:
    """A with cols (v, n): col v*16+n applies D[v] to block n."""
    d = dct_basis_np("float32")
    a = np.zeros((128, 128), np.float32)
    for n in range(16):
        for v in range(8):
            a[n * 8: n * 8 + 8, v * 16 + n] = d[v]
    return a


def _stereo_q_tile(scales64) -> jax.Array:
    """(128,128) quant multiplier for the stereo Z tile: rows (u,m),
    cols (v,n); fy-major LUT index p = u*8 + v."""
    s = jnp.asarray(scales64, jnp.float32).reshape(8, 8)  # p = u*8 + v
    rows = jnp.repeat(s, 16, axis=0)        # (128, 8): u-major rows
    return jnp.repeat(rows, 16, axis=1)     # (128, 128): v-major col groups


def _stereo_groups(num_chunks: int):
    """8-chunk octets + one tail group of the remaining chunks."""
    groups, base = [], 0
    while base + 8 <= num_chunks:
        groups.append((base, 8))
        base += 8
    if base < num_chunks:
        groups.append((base, num_chunks - base))
    return tuple(groups)


@functools.lru_cache(maxsize=None)
def _zipmat_np(halves: int) -> np.ndarray:
    """(32h, 32h) 0/1 sublane-zip matrix: row 2i+view <- stacked row
    view*16h + i.  The strip-row interleave of the reference stereo
    stream as a constant s8 MXU matmul — jnp.repeat/stack/reshape
    sublane-interleave formulations all crash the Mosaic remote
    compiler when composed with the DCT pipeline (round 4, measured);
    the matmul form lowers, and each output byte is exactly one input
    byte mod 256, so bitcast-s8 / s32-accumulate / &255 is exact (the
    same argument as the scalar-layout Pi matmul)."""
    n = 32 * halves
    p = np.zeros((n, n), np.int8)
    for view in range(2):
        for i in range(16 * halves):
            p[2 * i + view, view * 16 * halves + i] = 1
    return p


def _stereo_compute_tile(x_ref, h, c, bmat, amat, q_big, rounding, dtype):
    """One (128,128) quantized stereo Z tile: normalize -> 2 basis
    matmuls -> quantize (shared by the interleaved and planar stereo
    encode kernels — keep their pipelines in lockstep)."""
    x = (x_ref[0, pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
         .astype(jnp.int32)
         .astype(jnp.float32) * jnp.float32(1.0 / 255.0)).astype(dtype)
    y = jnp.dot(x, amat, preferred_element_type=jnp.float32).astype(dtype)
    z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
    return _quantize_tile(z * q_big, rounding)


def _enc_stereo_ilv_kernel(xl_ref, xr_ref, b_ref, a_ref, q_ref, z_ref,
                           out_ref, *, rounding: str, groups, dtype,
                           halves: int):
    """Reference-interleaved stereo encode with NO epilogue: the output
    is (64, 2S, BW) — a pure reshape of the reference byte stream
    (plane, strip, view, b) — built by zipping both views' plane pieces
    on the SUBLANE axis via the constant zip matmul.  Measured 129 vs
    154 us/dual-view 4K for the kernel + XLA-transpose path it replaces
    (experiments/exp_r9_stereo_ilv.py), byte-identical."""
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    zp = z_ref[...]

    for base, size in groups:
        tiles = {v: [[_stereo_compute_tile(x_ref, h, base + i, bmat, amat,
                                           q_big, rounding, dtype)
                      for i in range(size)] for h in range(halves)]
                 for v, x_ref in ((0, xl_ref), (1, xr_ref))}
        for u in range(8):
            for v in range(8):
                per_view = []
                for view in range(2):
                    rows = [jnp.concatenate(
                        [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                         for t in tiles[view][h]], axis=1)
                        for h in range(halves)]
                    per_view.append(rows[0] if halves == 1
                                    else jnp.concatenate(rows, axis=0))
                stacked = pltpu.bitcast(
                    jnp.concatenate(per_view, axis=0), jnp.int8)
                piece = (jax.lax.dot_general(
                    zp, stacked, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                    & 255).astype(jnp.uint8)
                out_ref[u * 8 + v, :, pl.ds(base * 16, 16 * size)] = piece


def _enc_stereo_kernel(xl_ref, xr_ref, b_ref, a_ref, q_ref,
                       out_ref, *, rounding: str, groups, dtype,
                       halves: int = 1, pad_bw: int = 0):
    # Up to two 128-row panels per grid step: each plane's strip piece is
    # 16 sublanes, below the (32, 128) u8 min store tile — pairing the
    # two halves' pieces makes every store 32-sublane aligned (the same
    # trick as the enc32/pair kernels' halves=2).
    #
    # ``pad_bw`` (the TPU-native stereo record format, round 5): the
    # last group's piece is lane-extended with quantized-zero bytes
    # (127) to close the plane row out to a 128-multiple minor dim —
    # pad_bw > 0 only when a tail group exists, and tail*16 + pad_bw is
    # exactly 128, so the final store stays lane-aligned.
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]
    last_base = groups[-1][0]

    for view, x_ref in ((0, xl_ref), (1, xr_ref)):
        for base, size in groups:
            tiles = [[_stereo_compute_tile(x_ref, h, base + i, bmat, amat,
                                           q_big, rounding, dtype)
                      for i in range(size)] for h in range(halves)]
            for u in range(8):
                for v in range(8):
                    pieces = [jnp.concatenate(
                        [t[u * 16:(u + 1) * 16, v * 16: v * 16 + 16]
                         for t in row], axis=1)       # (16, 16*size)
                        for row in tiles]
                    piece = (pieces[0] if halves == 1
                             else jnp.concatenate(pieces, axis=0))
                    width = 16 * size
                    if pad_bw and base == last_base:
                        piece = jnp.concatenate(
                            [piece, jnp.full((16 * halves, pad_bw), 127,
                                             jnp.uint8)], axis=1)
                        width += pad_bw
                    out_ref[view, u * 8 + v, :,
                            pl.ds(base * 16, width)] = piece


@functools.partial(jax.jit, static_argnames=("rounding", "interpret",
                                             "precision", "view_layout",
                                             "halves"))
def _enc_stereo_panels(img: jax.Array, scales: jax.Array, *, rounding: str,
                       interpret: bool = False,
                       precision: str = "bf16",
                       view_layout: str = "interleaved",
                       halves: int | None = None) -> jax.Array:
    """(H, W) u8 dual-view image -> planar coefficient tensor.

    ``view_layout='interleaved'`` (reference parity): (64, S, 2, BW),
    flattening row-major to the reference's planar byte stream
    (src/simd_dct.cpp:896-1103: per plane, per strip, BW left-view then
    BW right-view bytes).  ``view_layout='planar'`` (fast path): the raw
    (2, 64, S, BW) kernel output — views stored separately, NO epilogue.

    Round 4: the interleaved layout is emitted DIRECTLY from its own
    kernel as (64, 2S, BW) — both views' plane pieces are computed in
    the same grid step and zipped on the sublane axis by the constant
    zip matmul (`_zipmat_np`), so the former XLA-transpose epilogue
    (~40% of the mode's wall) is gone: 129 vs 154 us/dual-view 4K,
    byte-identical (experiments/exp_r9_stereo_ilv.py).  Earlier
    attempts that interleaved on the LANE axis (BW-offset masked
    stores) measured 2x worse and remain negative results
    (experiments/stereo_interleave_store.py).  The planar layout keeps
    the per-view kernel: every store 128-aligned, no zip matmuls."""
    h, w = img.shape
    h2 = h // 2
    assert h2 % 8 == 0 and w % CHUNK == 0
    if halves is None:
        halves = 2 if h2 > PANEL else 1
    # halves=4 measured OOM against the 16 MB scoped-VMEM limit at 4K
    # (double-buffered 2x(512,W) inputs + (2,64,64,BW) output = 17.6 MB)
    assert halves in (1, 2), "stereo kernel supports halves in (1, 2)"
    n_pg = -(-h2 // (PANEL * halves))
    bw = w // 8
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # (2, H2, W) view tensor (pure reshape) so the right view starts on
    # a block boundary for ANY H2 % 8 == 0, not just panel multiples;
    # the final partial panel relies on Mosaic edge-block masking.
    views = img.reshape(2, h2, w)
    if view_layout == "interleaved":
        # round 4: the interleaved stream is emitted directly from the
        # kernel via the sublane-zip matmul — no transpose epilogue
        # (129 vs 154 us/dual-view 4K, byte-identical)
        kernel = functools.partial(_enc_stereo_ilv_kernel,
                                   rounding=rounding,
                                   groups=_stereo_groups(w // CHUNK),
                                   dtype=dtype, halves=halves)
        grid_spec = pl.GridSpec(
            grid=(n_pg,),
            in_specs=[
                pl.BlockSpec((1, PANEL * halves, w), lambda pg: (0, pg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PANEL * halves, w), lambda pg: (1, pg, 0),
                             memory_space=pltpu.VMEM)] + [
                pl.BlockSpec((128, 128), lambda pg: (0, 0),
                             memory_space=pltpu.VMEM)] * 3 + [
                pl.BlockSpec((32 * halves, 32 * halves),
                             lambda pg: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, 32 * halves, bw),
                                   lambda pg: (0, pg, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((64, 2 * (h2 // 8), bw),
                                           jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * 128 * 128 * w * 2 * halves * n_pg,
                bytes_accessed=2 * h * w, transcendentals=0),
            interpret=interpret,
        )(views, views, jnp.asarray(_row_basis_np()).astype(dtype),
          jnp.asarray(_stereo_col_basis_np()).astype(dtype),
          _stereo_q_tile(scales), jnp.asarray(_zipmat_np(halves)))
        return out.reshape(64, h2 // 8, 2, bw)
    # 'planar' keeps the raw (2, 64, S, BW) kernel output; 'native'
    # (round 5, the format the round-4 u8-DMA minor-dim analysis
    # demands) lane-pads every plane row with quantized-zero bytes
    # (127) to BWP = ceil(BW/128)*128 INSIDE the kernel — the output
    # block's minor dim becomes a 128 multiple, so the store DMA runs
    # at full speed instead of the ~1/3-speed masked path the
    # reference-geometry 480-byte rows force (docs/STATUS.md "u8 DMA
    # minor-dim lesson"; copy probe: (64,32,960) 368 GB/s vs
    # (64,16,1920) 1121 GB/s).  The pad rides the tail store group
    # (tail*16 + pad == 128), costing no extra stores.
    bw_out = _ceil_to(bw, 128) if view_layout == "native" else bw
    kernel = functools.partial(_enc_stereo_kernel, rounding=rounding,
                               groups=_stereo_groups(w // CHUNK),
                               dtype=dtype, halves=halves,
                               pad_bw=bw_out - bw)
    grid_spec = pl.GridSpec(
        grid=(n_pg,),
        in_specs=[
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (0, pg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PANEL * halves, w), lambda pg: (1, pg, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda pg: (0, 0),
                         memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((2, 64, 16 * halves, bw_out),
                               lambda pg: (0, 0, pg, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, 64, h2 // 8, bw_out),
                                       jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * 2 * halves * n_pg,
            bytes_accessed=2 * h * w, transcendentals=0),
        interpret=interpret,
    )(views, views, jnp.asarray(_row_basis_np()).astype(dtype),
      jnp.asarray(_stereo_col_basis_np()).astype(dtype),
      _stereo_q_tile(scales))
    return out


# -- hybrid modes: pallas tile compute + XLA byte-record permute -----------
# (the enc-quant SCALAR layout and the decode paths still assemble byte
# records in XLA; scalar interleaves u at 4-byte granularity across BOTH
# u-halves, which the fused pipelines cannot express without costly
# permutation matmuls — and scalar is only the reference's NoSimd
# fallback layout, while the SIMD layouts have fused kernels.)

def encode_quantize(img, lut, start_y=0, end_y=1 << 30, rounding="rne",
                    layout="scalar", legacy_range=False, interpret=False,
                    precision="bf16"):
    """Fast path for simdDCT_EncodeQuantizeBuffer semantics: fully fused
    in-kernel for the SIMD pair layouts (src/simd_dct.cpp:1540-1704);
    hybrid (tile kernel + XLA permute) for the NoSimd scalar layout."""
    h, w = img.shape
    h2 = h // 2
    wp = max(_ceil_to(w, CHUNK), 4 * CHUNK)
    from .xla_path import _strip_mask   # one impl of the y-vs-y*2 quirk
    mask = _strip_mask(h2 // 8, start_y, end_y, legacy_range)
    # partial-range as-written needs the intended pair stream so the
    # cross-strip spill bytes can be composed (reference cursor
    # semantics, see layout.reorder.pair_as_written_masked); the
    # full-range case keeps the cheaper in-kernel zeroed stores.
    aw_partial = layout == "pair_as_written" and not mask.all()
    records = _encq_pair_panels(
        _pad_view(img[:h2, :], h2, wp), quant_scales(lut),
        rounding=rounding,
        as_written=(layout == "pair_as_written" and not aw_partial),
        scalar_pi=(layout == "scalar"), interpret=interpret,
        precision=precision)
    records = _slice_records(records, h2 // 8, w, 16, h2 // 8, wp)
    if aw_partial:
        from ..layout import reorder as _reorder
        return _reorder.pair_as_written_masked(records.reshape(-1), mask,
                                               8 * w)
    return _mask_strips(records, start_y, end_y, legacy_range).reshape(-1)


def decode_quantize(data, lut, size_x, size_y, layout="scalar",
                    interpret=False, precision="bf16"):
    """Fast path for the enc-quant inverse: fully in-kernel (the exact
    inverse of the fused encode pipeline; unaligned geometries via
    record padding)."""
    h2 = size_y // 2
    records = jnp.asarray(data).reshape(h2 // 8, 8 * size_x)
    wp = max(_ceil_to(size_x, CHUNK), 4 * CHUNK)
    records = _pad_records(records, h2 // 8, size_x, 16, h2 // 8, wp)
    out = _decq_pair_panels(records, dequant_scales(lut),
                            scalar_pi=(layout == "scalar"),
                            interpret=interpret, precision=precision)
    return out[:, :size_x] if wp != size_x else out


def encode_quantize_stereo(img, lut, start_y=0, end_y=1 << 30,
                           rounding="rne", interpret=False,
                           precision="bf16", view_layout="interleaved"):
    """Fast path for the stereo coefficient-planar mode: fully fused
    in-kernel (src/simd_dct.cpp:896-1103 semantics).

    ``view_layout='planar'`` returns the (2, 64, S, BW) separate-views
    tensor — the kernel's native output, NO interleave epilogue (the
    reference byte stream is recoverable via
    ``layout.reorder.stereo_views_to_interleaved``).

    ``view_layout='native'`` (round 5) returns (2, 64, S, BWP) with
    BWP = ceil(BW/128)*128 and all block columns >= BW holding
    quantized-zero bytes (127): the TPU-native record format whose
    plane rows DMA at full speed (128-multiple minor dim) — the pad is
    emitted in-kernel, no extra HBM pass in either direction."""
    h, w = img.shape
    h2, bw = h // 2, w // 8
    wp = _ceil_to(w, CHUNK)
    if wp != w:   # W padding pads both stacked views row-wise at once
        # zero pad pixels encode to exactly 127 records (all-zero
        # coefficients + bias), so for the native layout the [bw, wp/8)
        # columns already match the pad definition — no slice needed
        img = jnp.pad(img, ((0, 0), (0, wp - w)))
    planar = _enc_stereo_panels(img, quant_scales(lut), rounding=rounding,
                                interpret=interpret, precision=precision,
                                view_layout=view_layout)
    if view_layout in ("planar", "native"):
        if wp != w and view_layout == "planar":
            planar = planar[..., :bw]
        if not (start_y == 0 and end_y >= h):
            s = np.arange(h // 16)
            mask = (s * 16 >= start_y) & (s * 16 <= end_y)
            planar = jnp.where(jnp.asarray(mask)[None, None, :, None],
                               planar, jnp.uint8(0))
        return planar
    if wp != w:
        planar = planar[:, :, :, :bw]
    flat = planar.reshape(-1)
    if not (start_y == 0 and end_y >= h):
        s = np.arange(h // 16)
        mask = (s * 16 >= start_y) & (s * 16 <= end_y)
        m = jnp.tile(jnp.repeat(jnp.asarray(mask), w // 4), 64)
        flat = jnp.where(m, flat, jnp.uint8(0))
    return flat


def decode_quantize_stereo(data, lut, size_x, size_y, interpret=False,
                           precision="bf16", view_layout="interleaved"):
    """Fast path for the stereo inverse: fully in-kernel (the exact
    inverse of the fused plane-patch encode).  ``view_layout='planar'``
    consumes the (2, 64, S, BW) separate-views tensor with every plane-
    patch load 128-aligned; ``view_layout='native'`` consumes the
    (2, 64, S, BWP) 128-multiple-padded tensor, reading it at full DMA
    speed and never touching the pad lanes (no slice pass)."""
    h2 = size_y // 2
    if view_layout == "native":
        bw_k = _ceil_to(size_x, CHUNK) // 8     # kernel block columns
        bwp = native_stereo_bwp(size_x)         # stored minor dim
        planar = jnp.asarray(data).reshape(2, 64, h2 // 8, bwp)
        out = _dec_stereo_panels(planar, dequant_scales(lut),
                                 interpret=interpret, precision=precision,
                                 true_bw=bw_k)
        if bw_k * 8 != size_x:
            out = out.reshape(2, h2, bw_k * 8)[:, :, :size_x] \
                .reshape(size_y, size_x)
        return out
    if view_layout == "planar":
        planar = jnp.asarray(data).reshape(2, 64, h2 // 8, size_x // 8)
        pad_axes = ((0, 0), (0, 0), (0, 0))
    else:
        planar = jnp.asarray(data).reshape(64, h2 // 8, 2, size_x // 8)
        pad_axes = ((0, 0), (0, 0), (0, 0))
    wp = _ceil_to(size_x, CHUNK)
    if wp != size_x:
        planar = jnp.pad(planar, pad_axes + ((0, (wp - size_x) // 8),))
    out = _dec_stereo_panels(planar, dequant_scales(lut),
                             interpret=interpret, precision=precision)
    if wp != size_x:
        out = out.reshape(2, h2, wp)[:, :, :size_x] \
            .reshape(size_y, size_x)
    return out
