"""Strict-IEEE ``compat='reference'`` execution engine (jax tier).

Byte-identical to the C++ oracle (``native/golden_dct.cpp``) — and hence
to the documented reference butterfly semantics (src/simd_dct.cpp:138-172)
— by construction: the DCT is evaluated in the butterfly's exact f32
association order (core.butterfly) and quantization in the oracle's exact
op order.

Why the staging: XLA backends contract ``add(mul(a,b), c)`` into an FMA
during codegen (LLVM ``ffp-contract`` on CPU), keeping the product at
infinite precision — and this survives ``lax.optimization_barrier`` (the
barrier is elided before fusion codegen; verified empirically, see
tests/test_compat.py).  Contraction cannot span separately compiled
executables, so this engine splits every float multiply whose result feeds
a float add into its own ``jax.jit`` program:

  stage 1: butterfly input sums + the 20 constant·value products
  stage 2: sums of stage-1 products + the final 1/sqrt(8) scaling

(adds feeding muls are safe — no fused add-into-multiply exists), and the
same split for the quantizer's multiply/bias.  ~9 device dispatches per
encode: this is a conformance tier, not a fast path (use the pallas/xla
tiers for speed; their output differs from the oracle by at most ±1 byte
on rounding-boundary coefficients).

NumPy note: the same butterfly functions run bit-exactly in plain NumPy
without staging (no contraction there); core.golden uses them directly
for ``compat=True``.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..core.dct import C_A, C_B, C_C, C_D, C_E, C_F, C_NORM
from ..core.quantize import VR
from ..layout import blocks as L_blocks
from ..layout import reorder as L_reorder

_HALF_BIAS = np.float32(np.float32(127.0) / np.float32(255.0))


# ---------------------------------------------------------------------------
# staged 1-D butterfly
# ---------------------------------------------------------------------------

@jax.jit
def _dct8_stage_products(v):
    """(..., 8) -> (..., 22): even-path sums (pp, qp) + all 20 products,
    each individually rounded f32 (no add consumes a mul in this program)."""
    v0, v1, v2, v3 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    v4, v5, v6, v7 = v[..., 4], v[..., 5], v[..., 6], v[..., 7]
    x07p = v0 + v7
    x16p = v1 + v6
    x25p = v2 + v5
    x34p = v3 + v4
    x07m = v0 - v7
    x61m = v6 - v1
    x25m = v2 - v5
    x43m = v4 - v3
    pp = x07p + x34p
    pm = x07p - x34p
    qp = x16p + x25p
    qm = x16p - x25p
    parts = [pp, qp,
             C_B * pm, C_E * qm, C_E * pm, C_B * qm,
             C_A * x07m, C_C * x61m, C_D * x25m, C_F * x43m,
             C_C * x07m, C_F * x61m, C_A * x25m, C_D * x43m,
             C_D * x07m, C_A * x61m, C_F * x25m, C_C * x43m,
             C_F * x07m, C_D * x61m, C_C * x25m, C_A * x43m]
    return jnp.stack(parts, axis=-1)


@jax.jit
def _dct8_stage_combine(parts):
    """(..., 22) -> (..., 8): left-to-right sums of the products + C_NORM
    scaling (no mul result feeds an add in this program)."""
    p = [parts[..., i] for i in range(22)]
    pp, qp = p[0], p[1]
    o0 = C_NORM * (pp + qp)
    o2 = C_NORM * (p[2] + p[3])
    o4 = C_NORM * (pp - qp)
    o6 = C_NORM * (p[4] - p[5])
    o1 = C_NORM * (p[6] - p[7] + p[8] - p[9])
    o3 = C_NORM * (p[10] + p[11] - p[12] + p[13])
    o5 = C_NORM * (p[14] + p[15] + p[16] - p[17])
    o7 = C_NORM * (p[18] + p[19] + p[20] + p[21])
    return jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=-1)


def _dct8_exact(v):
    return _dct8_stage_combine(_dct8_stage_products(v))


def dct2d_fx_major_exact(blocks):
    """enc-quant orientation (DCT rows, transpose, DCT rows) on (..., 8, 8);
    flat result is the fx-major buffer (src/simd_dct.cpp:347-358)."""
    b = _dct8_exact(blocks)
    return _dct8_exact(jnp.swapaxes(b, -1, -2))


def dct2d_fy_major_exact(blocks):
    """stereo / mode32 orientation (leading transpose,
    src/simd_dct.cpp:224-227); flat result is the fy-major buffer."""
    b = _dct8_exact(jnp.swapaxes(blocks, -1, -2))
    return _dct8_exact(jnp.swapaxes(b, -1, -2))


# ---------------------------------------------------------------------------
# staged exact quantizer (oracle op order: native/golden_dct.cpp:98-119)
# ---------------------------------------------------------------------------

@jax.jit
def _q_mul(buffer, q):
    return buffer * q


@jax.jit
def _q_rne_finish(x):
    v = jnp.rint(x).astype(jnp.int32) + 127   # integer add: not contractible
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


@jax.jit
def _q_clamp_first_finish(x):
    v = jnp.clip(x + np.float32(127.0), np.float32(0.0), np.float32(255.0))
    return jnp.rint(v).astype(jnp.uint8)


@jax.jit
def _q_scalar_scale(x):
    return jnp.clip(x + _HALF_BIAS, np.float32(0.0), np.float32(1.0)) \
        * np.float32(255.0)


@jax.jit
def _q_roundf(v):
    # exact roundf (half away from zero) for v >= 0; the floor(v+0.5)
    # shortcut diverges when v+0.5 rounds up across an integer.
    w = jnp.floor(v)
    return jnp.where(v - w >= np.float32(0.5),
                     w + np.float32(1.0), w).astype(jnp.uint8)


def quantize_exact(buffer, lut, rounding: str):
    lut_f = np.asarray(lut, np.float32).reshape(64)
    if rounding == "scalar":
        q = jnp.asarray(np.float32(1.0) / (lut_f * VR))
        return _q_roundf(_q_scalar_scale(_q_mul(buffer, q)))
    q = jnp.asarray(np.float32(255.0) / (lut_f * VR))
    if rounding == "rne":
        return _q_rne_finish(_q_mul(buffer, q))
    if rounding == "clamp_first":
        return _q_clamp_first_finish(_q_mul(buffer, q))
    raise ValueError(f"unknown rounding {rounding!r}")


# ---------------------------------------------------------------------------
# encode entry points (mirror kernels/xla_path.py, exact engine)
# ---------------------------------------------------------------------------

@jax.jit
def _normalize_blocks(view):
    return L_blocks.blockize(view).astype(jnp.float32) * jnp.float32(1.0 / 255.0)


@jax.jit
def _raw_blocks(view):
    return L_blocks.blockize(view).astype(jnp.float32)


# strip-range masking: shared with the XLA tier (same semantics, one
# implementation of the legacy_range y-vs-y*2 quirk)
from .xla_path import _strip_mask, _apply_mask  # noqa: E402


def encode_quantize(img, lut, start_y=0, end_y=1 << 30, rounding="rne",
                    layout="scalar", legacy_range=False):
    h, w = img.shape
    x = _normalize_blocks(img[: h // 2, :])             # (S, BW, 8, 8)
    bufs = dct2d_fx_major_exact(x).reshape(*x.shape[:-2], 64)
    data = quantize_exact(bufs, lut, rounding)
    flat = (L_reorder.block_contiguous(data) if layout == "scalar"
            else L_reorder.pair_cells(data))
    mask = _strip_mask(h // 16, start_y, end_y, legacy_range)
    if layout == "pair_as_written":
        return L_reorder.pair_as_written_masked(flat, mask, 8 * w)
    return _apply_mask(flat, mask, 8 * w)


def encode_quantize32(img, lut, start_y=0, end_y=1 << 30, rounding="rne"):
    h, w = img.shape
    x = _raw_blocks(img[: h // 2, :])
    bufs = dct2d_fy_major_exact(x).reshape(*x.shape[:-2], 64)
    data = quantize_exact(bufs, lut, rounding)
    flat = L_reorder.group8(data)
    return _apply_mask(flat, _strip_mask(h // 16, start_y, end_y), 8 * w)


def encode_quantize_stereo(img, lut, start_y=0, end_y=1 << 30, rounding="rne"):
    h, w = img.shape
    views = img.reshape(2, h // 2, w)
    x = _normalize_blocks(views.reshape(h, w)).reshape(2, h // 16, w // 8, 8, 8)
    bufs = dct2d_fy_major_exact(x).reshape(*x.shape[:-2], 64)
    data = quantize_exact(bufs, lut, rounding)
    flat = L_reorder.planar_stereo(data)
    mask = _strip_mask(h // 16, start_y, end_y)
    if not mask.all():
        m = jnp.tile(jnp.repeat(jnp.asarray(mask), w // 4), 64)
        flat = jnp.where(m, flat, jnp.uint8(0))
    return flat


# ---------------------------------------------------------------------------
# staged exact inverse (oracle op order: native/golden_dct.cpp idct8 —
# x[n] = sum_k kD[k][n]*v[k], plain dot products, ascending k)
# ---------------------------------------------------------------------------

def _idct_kd() -> np.ndarray:
    """The oracle's kD table: kD[k] = row k of the forward butterfly
    basis, every entry a single f32 product (native/golden_dct.cpp)."""
    n, a, b, c, d, e, f = (np.float32(C_NORM), np.float32(C_A),
                           np.float32(C_B), np.float32(C_C),
                           np.float32(C_D), np.float32(C_E), np.float32(C_F))
    one = np.float32(1.0)
    rows = [
        [one, one, one, one, one, one, one, one],
        [a, c, d, f, -f, -d, -c, -a],
        [b, e, -e, -b, -b, -e, e, b],
        [c, -f, -a, -d, d, a, f, -c],
        [one, -one, -one, one, one, -one, -one, one],
        [d, -a, f, c, -c, -f, a, -d],
        [e, -b, b, -e, -e, b, -b, e],
        [f, -d, c, -a, a, -c, d, -f],
    ]
    kd = np.empty((8, 8), np.float32)
    for k in range(8):
        for j in range(8):
            kd[k, j] = n * np.float32(rows[k][j])   # one f32 product each
    return kd


@jax.jit
def _idct8_products(v):
    """(..., 8) -> (..., 8, 8): products p[..., n, k] = kD[k][n]*v[..., k]
    (muls only — nothing for FMA contraction to grab)."""
    kd = jnp.asarray(_idct_kd())                    # [k, n]
    return v[..., None, :] * kd.T[None, ...]        # [..., n, k]


@jax.jit
def _idct8_sums(p):
    """(..., 8, 8) -> (..., 8): strict ascending-k accumulation (adds
    only; matches the oracle's ``acc += kD[k][n]*v[k]`` order)."""
    s = p[..., 0]
    for k in range(1, 8):
        s = s + p[..., k]
    return s


@jax.jit
def _idct_mid(p1):
    """Pass-1 sums + transpose + pass-2 products in ONE program: adds
    feeding muls are safe (FMA only fuses a mul INTO an add)."""
    s = p1[..., 0]
    for k in range(1, 8):
        s = s + p1[..., k]
    t = jnp.swapaxes(s, -1, -2)
    kd = jnp.asarray(_idct_kd())
    return t[..., None, :] * kd.T[None, ...]


@jax.jit
def _idct_finish_raw(p2):
    """Pass-2 sums + trailing transpose + RNE pixel (raw domain)."""
    s = p2[..., 0]
    for k in range(1, 8):
        s = s + p2[..., k]
    x = jnp.swapaxes(s, -1, -2)
    v = jnp.rint(x).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


@jax.jit
def _idct_finish_scaled(p2):
    """Pass-2 sums + trailing transpose + x*255 + RNE pixel (normalized
    domain; the mul is fed by adds — not contractible)."""
    s = p2[..., 0]
    for k in range(1, 8):
        s = s + p2[..., k]
    x = jnp.swapaxes(s, -1, -2) * np.float32(255.0)
    v = jnp.rint(x).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


@jax.jit
def _idct_finish_scaled_fx(p2):
    """fx orientation: NO trailing transpose (inverse of dct rows,
    transpose, dct rows)."""
    s = p2[..., 0]
    for k in range(1, 8):
        s = s + p2[..., k]
    x = s * np.float32(255.0)
    v = jnp.rint(x).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _dequant_products(data, lut):
    """Oracle dequant: qi[p] = (lut[p]*vr)/255; buf = (v-127)*qi — the sub
    feeds a mul (safe), and the products feed the pass-1 products (muls
    feeding muls: safe), all in one program with _idct8_products."""
    lut_f = np.asarray(lut, np.float32).reshape(64)
    qi = (lut_f * np.float32(VR)) / np.float32(255.0)  # numpy: exact f32 ops
    return _deq_jit(data, jnp.asarray(qi))


@jax.jit
def _deq_jit(data, qi):
    b = (data.astype(jnp.float32) - np.float32(127.0)) * qi
    blocks = b.reshape(*b.shape[:-1], 8, 8)
    return _idct8_products(blocks)


def _idct2d_fy_exact_pixels(data, lut, scaled):
    """(..., 64) u8 records (fy-major buffers) -> (..., 8, 8) u8 pixels."""
    p1 = _dequant_products(data, lut)
    p2 = _idct_mid(p1)
    return (_idct_finish_scaled(p2) if scaled else _idct_finish_raw(p2))


def _idct2d_fx_exact_pixels(data, lut):
    """fx-major: buffer rows are the FIRST idct8 pass (no leading
    transpose in the inverse; the trailing transpose is absent)."""
    p1 = _dequant_products(data, lut)
    p2 = _idct_mid(p1)
    return _idct_finish_scaled_fx(p2)


# ---------------------------------------------------------------------------
# decode entry points (byte-exact vs native/golden_dct.cpp decode oracle)
# ---------------------------------------------------------------------------

def decode_quantize(data, lut, size_x, size_y, layout="scalar"):
    """enc-quant inverse (fx-major, normalized domain).  The overlapping
    ``pair_as_written`` layout has no decodable inverse."""
    if layout == "pair_as_written":
        raise ValueError("pair_as_written records are not decodable")
    h2, w = size_y // 2, size_x
    flat = jnp.asarray(data).reshape(-1)
    bufs = (L_reorder.block_contiguous_inverse(flat, w // 8)
            if layout == "scalar"
            else L_reorder.pair_cells_inverse(flat, w // 8))
    px = _idct2d_fx_exact_pixels(bufs.reshape(h2 // 8, w // 8, 64), lut)
    return L_blocks.unblockize(px.reshape(h2 // 8, w // 8, 8, 8))


def decode_quantize32(data, lut, size_x, size_y):
    """mode32 inverse (fy-major, raw domain)."""
    h2, w = size_y // 2, size_x
    flat = jnp.asarray(data).reshape(-1)
    bufs = L_reorder.group8_inverse(flat, w // 8)
    px = _idct2d_fy_exact_pixels(bufs.reshape(h2 // 8, w // 8, 64), lut,
                                 scaled=False)
    return L_blocks.unblockize(px.reshape(h2 // 8, w // 8, 8, 8))


def decode_quantize_stereo(data, lut, size_x, size_y):
    """stereo planar inverse (fy-major, normalized domain, both views)."""
    h2, w = size_y // 2, size_x
    flat = jnp.asarray(data).reshape(-1)
    bufs = L_reorder.planar_stereo_inverse(flat, size_y // 16, w // 8)
    px = _idct2d_fy_exact_pixels(
        bufs.reshape(2, h2 // 8, w // 8, 64), lut, scaled=True)
    views = L_blocks.unblockize(px.reshape(2 * (h2 // 8), w // 8, 8, 8))
    return views.reshape(size_y, w)
