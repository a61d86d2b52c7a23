"""The reference's three output byte layouts as pure array transforms.

On TPU every "reorder" of the reference (scattered per-plane cursors,
64-register store networks) is just an axis permutation of the output
tensor -- trivially coalesced, invertible, and fusible (SURVEY.md §3.3).

Buffer orders (coefficient index p within a block's 64-byte record):

* enc-quant modes store the block buffer **fx-major**: ``p = fx*8 + fy``
  (no leading transpose: DCT rows, transpose, DCT rows --
  src/simd_dct.cpp:347-358), i.e. the byte stream is the *transposed*
  coefficient matrix.
* stereo and enc-quant32 store **fy-major**: ``p = fy*8 + fx``
  (leading transpose, src/simd_dct.cpp:224-227; register-indexed column
  pass, src/simd_dct.cpp:1983-2011).

The quantization LUT always indexes buffer order, whichever it is.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.golden import pair_cell_permutation


# -- buffer order ----------------------------------------------------------

def coeffs_to_buffer(coeffs: jnp.ndarray, orientation: str) -> jnp.ndarray:
    """(..., 8, 8) (fy, fx)-indexed coefficients -> (..., 64) buffer order."""
    if orientation == "fy":
        return coeffs.reshape(*coeffs.shape[:-2], 64)
    if orientation == "fx":
        return jnp.swapaxes(coeffs, -1, -2).reshape(*coeffs.shape[:-2], 64)
    raise ValueError(f"orientation must be 'fx' or 'fy', got {orientation!r}")


def buffer_to_coeffs(buf: jnp.ndarray, orientation: str) -> jnp.ndarray:
    """(..., 64) buffer order -> (..., 8, 8) (fy, fx)-indexed coefficients."""
    c = buf.reshape(*buf.shape[:-1], 8, 8)
    if orientation == "fy":
        return c
    if orientation == "fx":
        return jnp.swapaxes(c, -1, -2)
    raise ValueError(f"orientation must be 'fx' or 'fy', got {orientation!r}")


# -- enc-quant: block-contiguous / SIMD pair cells -------------------------

def block_contiguous(bufs: jnp.ndarray) -> jnp.ndarray:
    """(S, BW, 64) per-block byte records -> flat (S*BW*64,) strip stream.

    Blocks raster order, 64 contiguous bytes per block
    (src/simd_dct.cpp:361-364)."""
    return bufs.reshape(-1)


def block_contiguous_inverse(flat: jnp.ndarray, bw: int) -> jnp.ndarray:
    return flat.reshape(-1, bw, 64)


_PAIR_INV = None


def _pair_inverse() -> np.ndarray:
    """inv[k] = flat (blk*64+p) index stored at cell byte k (0..127)."""
    global _PAIR_INV
    if _PAIR_INV is None:
        perm = pair_cell_permutation(False)  # (2, 64) -> byte offset
        inv = np.empty(128, np.int32)
        for blk in range(2):
            for p in range(64):
                inv[perm[blk, p]] = blk * 64 + p
        _PAIR_INV = inv
    return _PAIR_INV


def pair_cells(bufs: jnp.ndarray) -> jnp.ndarray:
    """(S, BW, 64) -> flat stream of 128-byte two-block cells
    (the SIMD enc-quant layout, intended non-overlapping variant;
    see core.golden.pair_cell_permutation)."""
    s, bw, _ = bufs.shape
    pairs = bufs.reshape(s, bw // 2, 128)
    cells = jnp.take(pairs, jnp.asarray(_pair_inverse()), axis=-1)
    return cells.reshape(-1)


def pair_as_written(flat_pair: jnp.ndarray) -> jnp.ndarray:
    """Intended pair-cell stream -> the kernels-AS-CODED surviving bytes.

    The SSE4.1/SSSE3 kernels store each cell's second half at byte +128
    (src/simd_dct.cpp:1662-1670), which lands exactly on the next cell's
    first half and is clobbered by it (the final spill falls off the
    strip/buffer and the cross-strip spill is clobbered by the next
    strip's first cell).  Net effect, verified against the overlap
    emulation in core.golden: byte [0,64) of every 128-byte cell is the
    intended layout's first half and byte [64,128) is never written
    (zero on the zero-initialized buffers all tiers use)."""
    cells = flat_pair.reshape(-1, 2, 64)
    keep = jnp.asarray(np.array([1, 0], np.uint8))[None, :, None]
    return (cells * keep).reshape(-1)


def pair_as_written_masked(flat_pair: jnp.ndarray, mask,
                           bytes_per_strip: int) -> jnp.ndarray:
    """As-written surviving bytes under a partial strip range (reference
    cursor semantics).  Beyond pair_as_written's zeroed second halves,
    an INCLUDED strip's last cell stores its 64 second-half bytes at
    +128 — the first-cell region of the FOLLOWING strip — and those
    bytes survive when that strip is excluded (the next strip's first
    cell would otherwise clobber them): src/simd_dct.cpp:1662-1670
    overlap + the per-strip cursor advance.  Matches the golden's
    emulate_overlap_bug and the C++ oracle for any [start_y, end_y]."""
    out = pair_as_written(flat_pair)
    mask = np.asarray(mask, bool)
    if mask.all():
        return out
    m = jnp.repeat(jnp.asarray(mask), bytes_per_strip)
    out = jnp.where(m, out, jnp.uint8(0))
    spill_into = np.zeros_like(mask)
    spill_into[1:] = mask[:-1] & ~mask[1:]
    if spill_into.any():
        rows = np.nonzero(spill_into)[0]
        strips = flat_pair.reshape(mask.size, bytes_per_strip)
        out = out.reshape(mask.size, bytes_per_strip)
        out = out.at[jnp.asarray(rows), :64].set(
            strips[jnp.asarray(rows - 1), -64:])
        out = out.reshape(-1)
    return out


def pair_cells_inverse(flat: jnp.ndarray, bw: int) -> jnp.ndarray:
    cells = flat.reshape(-1, bw // 2, 128)
    perm = pair_cell_permutation(False).reshape(-1)  # (blk*64+p) -> byte
    pairs = jnp.take(cells, jnp.asarray(perm, jnp.int32), axis=-1)
    return pairs.reshape(cells.shape[0], bw, 64)


# -- enc-quant32: group-of-8 coefficient-major -----------------------------

def group8(bufs: jnp.ndarray) -> jnp.ndarray:
    """(S, BW, 64) -> flat stream; per 8-block group the 512-byte record is
    coefficient-major: byte ``p*8 + b`` = coefficient p of group block b
    (src/simd_dct.cpp:2021-2025)."""
    s, bw, _ = bufs.shape
    g = bufs.reshape(s, bw // 8, 8, 64)
    return jnp.swapaxes(g, -1, -2).reshape(-1)


def group8_inverse(flat: jnp.ndarray, bw: int) -> jnp.ndarray:
    g = flat.reshape(-1, bw // 8, 64, 8)
    return jnp.swapaxes(g, -1, -2).reshape(g.shape[0], bw, 64)


# -- stereo: fully coefficient-planar --------------------------------------

def planar_stereo(bufs: jnp.ndarray) -> jnp.ndarray:
    """(2, S, BW, 64) [view, strip, block, coeff] -> flat (64*plane,) stream.

    64 planes of ``W*H/64`` bytes; plane p holds, strip-by-strip, BW bytes
    of the LEFT view then BW bytes of the RIGHT view
    (src/simd_dct.cpp:258-264,284-294)."""
    planes = jnp.transpose(bufs, (3, 1, 0, 2))  # (64, S, view, BW)
    return planes.reshape(-1)


def planar_stereo_inverse(flat: jnp.ndarray, s: int, bw: int) -> jnp.ndarray:
    planes = flat.reshape(64, s, 2, bw)
    return jnp.transpose(planes, (2, 1, 3, 0))  # (view, S, BW, 64)


def stereo_views_to_interleaved(views: jnp.ndarray) -> jnp.ndarray:
    """(2, 64, S, BW) separate-views tensor (the fused stereo kernel's
    native ``view_layout='planar'`` output) -> the reference's flat
    interleaved byte stream (per plane, per strip, BW left then BW right
    bytes, src/simd_dct.cpp:258-264).  This transpose IS the epilogue the
    fast path skips — call it only at compat boundaries."""
    return jnp.transpose(views, (1, 2, 0, 3)).reshape(-1)


def stereo_interleaved_to_views(flat: jnp.ndarray, s: int,
                                bw: int) -> jnp.ndarray:
    """Reference interleaved stereo stream -> (2, 64, S, BW) tensor."""
    return jnp.transpose(flat.reshape(64, s, 2, bw), (2, 0, 1, 3))
