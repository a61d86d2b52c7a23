"""Public API: validated encode/decode entry points with tiered dispatch.

The TPU analog of ``src/simd_dct.h:29-31`` — three encode entry points with
identical validation contracts (simdDctResult semantics), plus the
north-star decode inverses.  Errors are typed exceptions carrying the
matching reference error code; ``try_*`` wrappers return the code instead
(for callers porting code written against the C enum API).

Validation parity (src/simd_dct.cpp:75-76,97-98,117-118):
  * null input -> InvalidParameter
  * W or H not multiple of 8 -> NotSupported
  * enc-quant32: W not multiple of 64 -> NotSupported
"""

from __future__ import annotations

import enum
from typing import Any

import jax

import numpy as np
import jax.numpy as jnp

from .core import golden as _golden
from .core.quantize import ROUNDING_MODES
from .dispatch.capability import select_backend
from .kernels import xla_path as _xla


class SimdDctResult(enum.IntEnum):
    """Mirror of simdDctResult (src/simd_dct.h:22-27)."""
    SUCCESS = 0
    INVALID_PARAMETER = 1
    NOT_SUPPORTED = 2


class SimdDctError(Exception):
    result: SimdDctResult = SimdDctResult.INVALID_PARAMETER


class InvalidParameterError(SimdDctError):
    result = SimdDctResult.INVALID_PARAMETER


class NotSupportedError(SimdDctError):
    result = SimdDctResult.NOT_SUPPORTED


_END_Y_SENTINEL = 1 << 30


def _validate(image: Any, lut: Any, *, multiple_of_64: bool = False,
              allow_spill: bool = False):
    if image is None or lut is None:
        raise InvalidParameterError("image and lut must not be None")
    img = jnp.asarray(image)
    if img.ndim not in (2, 3):
        raise InvalidParameterError(
            f"expected a (H, W) image or (B, H, W) batch, got shape {img.shape}")
    h, w = img.shape[-2:]
    if (w % 8) or (h % 8):
        raise NotSupportedError(
            f"image dims must be multiples of 8, got {(w, h)}")
    if h % 16 and not allow_spill:
        # The reference accepts any H % 8 == 0 but its dual-view strip loop
        # (y < H/2 step 8, src/simd_dct.cpp:268) then reads the last strip
        # past the first view into the second and writes past H/2*W output
        # bytes — spill semantics rejected by default; pass spill=True on
        # the encode entry points to opt into exact reference behavior
        # (SURVEY.md §7 "odd geometry rules": do both, default native).
        raise NotSupportedError(
            f"dual-view geometry requires H % 16 == 0, got H={h} "
            "(pass spill=True for reference spill semantics)")
    if multiple_of_64 and (w % 64):
        raise NotSupportedError(
            f"enc-quant32 requires W % 64 == 0 (src/simd_dct.cpp:118), got {w}")
    if img.dtype != jnp.uint8:
        raise InvalidParameterError(f"image must be uint8, got {img.dtype}")
    lut_arr = np.asarray(lut, np.float32).reshape(-1)
    if lut_arr.size != 64:
        raise InvalidParameterError(f"lut must have 64 entries, got {lut_arr.size}")
    if not np.all(np.isfinite(lut_arr)) or np.any(lut_arr <= 0):
        # The reference divides by lut*0.95 unchecked (src/simd_dct.cpp:196);
        # we reject non-positive/non-finite entries instead of emitting inf.
        raise InvalidParameterError("lut entries must be positive and finite")
    return img, lut_arr, h, w


def _check_rounding(rounding: str):
    if rounding not in ROUNDING_MODES:
        raise InvalidParameterError(
            f"rounding must be one of {ROUNDING_MODES}, got {rounding!r}")


def _resolve_end_y(end_y):
    """None -> open-ended (NOT clamped to H: the reference compares the
    raw caller value against y*2 each strip, src/simd_dct.cpp:268)."""
    return _END_Y_SENTINEL if end_y is None else int(end_y)


def _spill_view_image(img, w: int):
    """(…, H, W) u8 with H % 16 == 8 -> (…, 2*R, W) synthetic dual-view
    image whose TOP view is rows [0, R), R = ceil((H/2)/8)*8 — exactly
    the rows the reference's spill strip reads (4 rows into the second
    view, src/simd_dct.cpp:268); the zero bottom view is never read by
    the non-stereo encode modes."""
    h = img.shape[-2]
    rows = -(-(h // 2) // 8) * 8
    top = img[..., :rows, :]
    pad = jnp.zeros(img.shape[:-2] + (rows, w), jnp.uint8)
    return jnp.concatenate([top, pad], axis=-2)


def _spill_stereo_image(img, w: int):
    """(…, H, W) u8 dual-view with H % 16 == 8 -> (…, 2*R, W) synthetic
    dual-view, R = ceil((H/2)/8)*8.  The reference's spill strip
    (src/simd_dct.cpp:1073) reads its LEFT-eye rows [H/2-4, H/2+4) —
    4 rows into the right eye, contiguous in the caller's buffer, so the
    extended left view is simply img[:R].  Its RIGHT-eye rows [H-4, H+4)
    run past the buffer (UB in the reference); the 4 out-of-bounds rows
    are substituted with zeros."""
    h = img.shape[-2]
    rows = -(-(h // 2) // 8) * 8
    left = img[..., :rows, :]                      # incl. 4 right-eye rows
    pad = jnp.zeros(img.shape[:-2] + (rows - h // 2, w), jnp.uint8)
    right = jnp.concatenate([img[..., h // 2:, :], pad], axis=-2)
    return jnp.concatenate([left, right], axis=-2)


def _stereo_native_bwp(size_x: int) -> int:
    """Padded plane-row length of the TPU-native stereo record format
    (the single definition lives in pallas_dct.native_stereo_bwp)."""
    from .kernels.pallas_dct import native_stereo_bwp
    return native_stereo_bwp(size_x)


def _maybe_batch(arr, fn_one, numpy_tier: bool, base_ndim: int = 2):
    """Apply a per-item function over an optional leading batch axis.

    Encode items are 2-D images; decode items are 1-D byte streams
    (base_ndim inferred from how the caller reshaped).  jax tiers vmap
    (one compile, one dispatch); the numpy golden tier loops host-side."""
    batched = arr.ndim == base_ndim + 1
    if not batched:
        return fn_one(arr)
    if numpy_tier:
        import numpy as _np
        return _np.stack([fn_one(_np.asarray(f)) for f in _np.asarray(arr)])
    return jax.vmap(fn_one)(arr)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_quantize(image, lut, start_y: int = 0, end_y: int | None = None, *,
                    rounding: str = "rne", layout: str = "scalar",
                    backend: str | None = None,
                    legacy_range: bool = False, compat: bool = False,
                    spill: bool = False,
                    pallas_interpret: bool = False):
    """≙ simdDCT_EncodeQuantizeBuffer: block-contiguous (or SIMD pair-cell)
    encode of the TOP view.  Returns a flat u8 array of H/2*W bytes.

    compat=True selects the strict-IEEE butterfly engine: output is
    byte-identical to the C++ oracle (native/golden_dct.cpp) on every
    tier (SURVEY.md §7 "Bit-exactness"; slower — conformance, not speed).

    spill=True additionally accepts H % 16 == 8 with exact reference
    spill semantics: the last strip reads 4 rows into the second view
    and the output grows to ceil((H/2)/8)*8*W bytes
    (src/simd_dct.cpp:268; rejected by default)."""
    img, lut_arr, h, w = _validate(image, lut, allow_spill=spill)
    _check_rounding(rounding)
    if spill and h % 16:
        img = _spill_view_image(img, w)
        h = img.shape[-2]   # tier gates must see the spilled geometry
    if layout not in ("scalar", "pair", "pair_as_written"):
        raise InvalidParameterError(
            "layout must be 'scalar', 'pair' or 'pair_as_written', "
            f"got {layout!r}")
    if layout != "scalar" and w % 16:
        # pair cells hold exactly 2 blocks (the SSE4.1 kernel's x += 16
        # loop, src/simd_dct.cpp:1588) — an odd block count per row has
        # no defined cell for the last block
        raise NotSupportedError(
            f"layout {layout!r} requires W % 16 == 0, got W={w}")
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    ey = _resolve_end_y(end_y)
    if tier == "numpy":
        return _maybe_batch(
            img, lambda im: _golden.encode_quantize_golden(
                np.asarray(im), lut_arr, start_y, ey, rounding=rounding,
                layout=layout, legacy_range=legacy_range, compat=compat),
            numpy_tier=True)
    if compat:
        from .kernels import compat as _compat
        return _maybe_batch(
            img, lambda im: _compat.encode_quantize(
                im, lut_arr, int(start_y), ey, rounding, layout,
                legacy_range),
            numpy_tier=False)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("enc_quant", h, w):
            return _maybe_batch(
                img, lambda im: _pl.encode_quantize(
                    im, jnp.asarray(lut_arr), int(start_y), ey, rounding,
                    layout, legacy_range, interpret=pallas_interpret),
                numpy_tier=False)
    return _maybe_batch(
        img, lambda im: _xla.encode_quantize(
            im, jnp.asarray(lut_arr), int(start_y), ey, rounding, layout,
            legacy_range),
        numpy_tier=False)


def encode_quantize32(image, lut, start_y: int = 0, end_y: int | None = None, *,
                      rounding: str = "rne", backend: str | None = None,
                      compat: bool = False, spill: bool = False,
                      pallas_interpret: bool = False):
    """≙ simdDCT_EncodeQuantize32ReorderBuffer: 8-block coefficient-major
    encode of the TOP view in the raw 0..255 domain.  Flat u8, H/2*W bytes.
    ``spill=True``: reference H % 16 == 8 spill semantics (see
    encode_quantize)."""
    img, lut_arr, h, w = _validate(image, lut, multiple_of_64=True,
                                   allow_spill=spill)
    _check_rounding(rounding)
    if spill and h % 16:
        img = _spill_view_image(img, w)
        h = img.shape[-2]   # tier gates must see the spilled geometry
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    ey = _resolve_end_y(end_y)
    if tier == "numpy":
        return _maybe_batch(
            img, lambda im: _golden.encode_quantize32_golden(
                np.asarray(im), lut_arr, start_y, ey, rounding=rounding,
                compat=compat),
            numpy_tier=True)
    if compat:
        from .kernels import compat as _compat
        return _maybe_batch(
            img, lambda im: _compat.encode_quantize32(
                im, lut_arr, int(start_y), ey, rounding),
            numpy_tier=False)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("enc_quant32", h, w):
            return _maybe_batch(
                img, lambda im: _pl.encode_quantize32(
                    im, jnp.asarray(lut_arr), int(start_y), ey, rounding,
                    interpret=pallas_interpret),
                numpy_tier=False)
        tier = "xla"
    return _maybe_batch(
        img, lambda im: _xla.encode_quantize32(
            im, jnp.asarray(lut_arr), int(start_y), ey, rounding),
        numpy_tier=False)


def encode_quantize_stereo(image, lut, start_y: int = 0,
                           end_y: int | None = None, *,
                           rounding: str = "rne", backend: str | None = None,
                           compat: bool = False, spill: bool = False,
                           view_layout: str = "interleaved",
                           pallas_interpret: bool = False):
    """≙ simdDCT_EncodeQuantizeReorderStereoBuffer: coefficient-planar
    encode of BOTH views.  Flat u8, H*W bytes (64 planes).

    ``view_layout='planar'`` returns a (2, 64, S, W/8) tensor with the
    two views' plane segments stored SEPARATELY — the fused kernel's
    native output, skipping the view-interleave epilogue (~40% of the
    mode's wall; the reference byte stream is one
    ``layout.reorder.stereo_views_to_interleaved`` away, and
    ``decode_quantize_stereo(view_layout='planar')`` consumes the tensor
    directly).  The default stays reference parity.

    ``view_layout='native'`` (round 5) returns (2, 64, S, BWP) with
    BWP = ceil(W/8 / 128) * 128: the planar tensor with every plane
    row lane-padded to a 128-multiple minor dim using quantized-zero
    bytes (127) — the TPU-native record format (the reference-geometry
    480-byte plane rows DMA at ~1/3 speed; see docs/STATUS.md "u8 DMA
    minor-dim lesson").  Pad columns hold 127 inside the encoded strip
    range and 0 in excluded strips (the whole strip row is zeroed,
    like the other layouts).  ``decode_quantize_stereo(
    view_layout='native')`` consumes it without any slice pass.

    ``spill=True`` accepts H % 16 == 8 with the reference's spill
    semantics where they are defined: the reference validates only
    H % 8 == 0 (src/simd_dct.cpp:75-76) and its strip loop (:1073) then
    runs a final half-strip whose LEFT-eye rows read 4 rows into the
    right eye (in-bounds and deterministic — reproduced exactly) and
    whose RIGHT-eye rows read past the caller's buffer (undefined even
    in C++ — substituted with zero rows here, documented divergence)."""
    if view_layout not in ("interleaved", "planar", "native"):
        raise InvalidParameterError(
            f"view_layout must be 'interleaved', 'planar' or 'native', "
            f"got {view_layout!r}")
    img, lut_arr, h, w = _validate(image, lut, allow_spill=spill)
    if spill and h % 16:
        img = _spill_stereo_image(img, w)
        h = img.shape[-2]   # tier gates must see the spilled geometry
    _check_rounding(rounding)
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    ey = _resolve_end_y(end_y)

    def _views(flat):
        from .layout import reorder as _reorder
        v = _reorder.stereo_interleaved_to_views(
            jnp.asarray(flat), h // 16, w // 8)
        if view_layout != "native":
            return v
        # tier-parity native form: 127-pad the plane rows, then re-zero
        # excluded strips so pad bytes match the fused kernel's range
        # semantics byte-for-byte
        pad = _stereo_native_bwp(w) - v.shape[-1]
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)),
                        constant_values=np.uint8(127))
        if not (start_y == 0 and ey >= h):
            s = np.arange(h // 16)
            mask = (s * 16 >= start_y) & (s * 16 <= ey)
            v = jnp.where(jnp.asarray(mask)[None, None, :, None],
                          v, jnp.uint8(0))
        return v

    if tier == "numpy":
        out = _maybe_batch(
            img, lambda im: _golden.encode_quantize_stereo_golden(
                np.asarray(im), lut_arr, start_y, ey, rounding=rounding,
                compat=compat),
            numpy_tier=True)
        if view_layout in ("planar", "native"):
            return _maybe_batch(jnp.asarray(out), _views, numpy_tier=False,
                                base_ndim=1)
        return out
    if compat:
        from .kernels import compat as _compat
        out = _maybe_batch(
            img, lambda im: _compat.encode_quantize_stereo(
                im, lut_arr, int(start_y), ey, rounding),
            numpy_tier=False)
        if view_layout in ("planar", "native"):
            return _maybe_batch(out, _views, numpy_tier=False, base_ndim=1)
        return out
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("enc_quant_stereo", h, w):
            return _maybe_batch(
                img, lambda im: _pl.encode_quantize_stereo(
                    im, jnp.asarray(lut_arr), int(start_y), ey, rounding,
                    interpret=pallas_interpret, view_layout=view_layout),
                numpy_tier=False)
    out = _maybe_batch(
        img, lambda im: _xla.encode_quantize_stereo(
            im, jnp.asarray(lut_arr), int(start_y), ey, rounding),
        numpy_tier=False)
    if view_layout in ("planar", "native"):
        return _maybe_batch(out, _views, numpy_tier=False, base_ndim=1)
    return out


# ---------------------------------------------------------------------------
# decode (north-star additions; no reference analogs)
# ---------------------------------------------------------------------------

def _validate_decode(data, lut, size_x, size_y, expect_bytes):
    if data is None or lut is None:
        raise InvalidParameterError("data and lut must not be None")
    if size_x <= 0 or size_y <= 0:
        # zero dims would make expect_bytes 0 and turn the batch modulo
        # below into a ZeroDivisionError (found by container fuzzing)
        raise InvalidParameterError(
            f"invalid dimensions {(size_x, size_y)}")
    if (size_x % 8) or (size_y % 8):
        raise NotSupportedError(
            f"dims must be multiples of 8, got {(size_x, size_y)}")
    if size_y % 16:
        raise NotSupportedError(
            f"dual-view geometry requires H % 16 == 0, got H={size_y}")
    d = jnp.asarray(data)
    if d.dtype != jnp.uint8:
        raise InvalidParameterError(
            f"record streams must be uint8, got {d.dtype} "
            "(encode-side validation is equally strict)")
    # optional leading batch axis: (B, ...) with per-item size expect_bytes
    if d.size % expect_bytes:
        raise InvalidParameterError(
            f"expected a multiple of {expect_bytes} bytes for "
            f"{(size_x, size_y)}, got {d.size}")
    batch = d.size // expect_bytes
    # a batched INPUT shape keeps its batch axis even for B == 1, so
    # decode stays shape-symmetric with the batched encode
    batched = batch > 1 or d.ndim >= 2
    d = d.reshape(batch, expect_bytes) if batched else d.reshape(-1)
    lut_arr = np.asarray(lut, np.float32).reshape(-1)
    if lut_arr.size != 64:
        raise InvalidParameterError("lut must have 64 entries")
    return d, lut_arr


def decode_quantize(data, lut, size_x: int, size_y: int, *,
                    layout: str = "scalar", backend: str | None = None,
                    compat: bool = False,
                    pallas_interpret: bool = False):
    if layout not in ("scalar", "pair"):
        # 'pair_as_written' drops every cell's second half on the floor
        # (src/simd_dct.cpp:1662-1670 overlap) — not invertible.
        raise InvalidParameterError(
            f"decodable layouts are 'scalar' and 'pair', got {layout!r}")
    if layout == "pair" and size_x % 16:
        raise NotSupportedError(
            f"layout 'pair' requires W % 16 == 0, got W={size_x}")
    d, lut_arr = _validate_decode(data, lut, size_x, size_y,
                                  (size_y // 2) * size_x)
    # tier selection FIRST so an invalid backend raises even with compat
    # (mirrors the encode entry points' ordering)
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    if compat:
        if tier == "numpy":
            # numpy = no-jax tier: the C++ oracle IS the compat decode
            from . import native as _native
            return _maybe_batch(
                d, lambda dd: _native.decode_quantize(
                    np.asarray(dd), lut_arr, size_x, size_y, layout=layout),
                numpy_tier=True, base_ndim=1)
        from .kernels import compat as _compat
        return _maybe_batch(
            d, lambda dd: _compat.decode_quantize(dd, lut_arr, size_x,
                                                  size_y, layout=layout),
            numpy_tier=False, base_ndim=1)
    if tier == "numpy":
        return _maybe_batch(
            d, lambda dd: _golden.decode_quantize_golden(
                np.asarray(dd), lut_arr, size_x, size_y, layout=layout),
            numpy_tier=True, base_ndim=1)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("dec_quant", size_y, size_x):
            return _maybe_batch(
                d, lambda dd: _pl.decode_quantize(
                    dd, jnp.asarray(lut_arr), size_x, size_y, layout,
                    interpret=pallas_interpret),
                numpy_tier=False, base_ndim=1)
    return _maybe_batch(
        d, lambda dd: _xla.decode_quantize(dd, jnp.asarray(lut_arr),
                                           size_x, size_y, layout),
        numpy_tier=False, base_ndim=1)


def decode_quantize32(data, lut, size_x: int, size_y: int, *,
                      backend: str | None = None,
                      compat: bool = False,
                      pallas_interpret: bool = False):
    if size_x % 64:
        raise NotSupportedError("enc-quant32 requires W % 64 == 0")
    d, lut_arr = _validate_decode(data, lut, size_x, size_y,
                                  (size_y // 2) * size_x)
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    if compat:
        if tier == "numpy":
            from . import native as _native
            return _maybe_batch(
                d, lambda dd: _native.decode_quantize32(
                    np.asarray(dd), lut_arr, size_x, size_y),
                numpy_tier=True, base_ndim=1)
        from .kernels import compat as _compat
        return _maybe_batch(
            d, lambda dd: _compat.decode_quantize32(dd, lut_arr, size_x,
                                                    size_y),
            numpy_tier=False, base_ndim=1)
    if tier == "numpy":
        return _maybe_batch(
            d, lambda dd: _golden.decode_quantize32_golden(
                np.asarray(dd), lut_arr, size_x, size_y),
            numpy_tier=True, base_ndim=1)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("dec_quant32", size_y, size_x):
            return _maybe_batch(
                d, lambda dd: _pl.decode_quantize32(
                    dd, jnp.asarray(lut_arr), size_x, size_y,
                    interpret=pallas_interpret),
                numpy_tier=False, base_ndim=1)
    return _maybe_batch(
        d, lambda dd: _xla.decode_quantize32(dd, jnp.asarray(lut_arr),
                                             size_x, size_y),
        numpy_tier=False, base_ndim=1)


def decode_quantize_stereo(data, lut, size_x: int, size_y: int, *,
                           backend: str | None = None,
                           compat: bool = False,
                           view_layout: str = "interleaved",
                           pallas_interpret: bool = False):
    """``view_layout='planar'`` consumes the (2, 64, S, W/8) separate-
    views tensor from ``encode_quantize_stereo(view_layout='planar')``
    directly (the pallas tier reads it with fully aligned loads; other
    tiers convert to the interleaved stream first).

    ``view_layout='native'`` consumes the (2, 64, S, BWP) 128-multiple
    padded tensor from ``encode_quantize_stereo(view_layout='native')``:
    the pallas tier reads the padded planes at full DMA speed and never
    touches the pad lanes (no slice pass); other tiers drop the pad
    columns and take the planar route."""
    if view_layout not in ("interleaved", "planar", "native"):
        raise InvalidParameterError(
            f"view_layout must be 'interleaved', 'planar' or 'native', "
            f"got {view_layout!r}")
    if view_layout == "native":
        dv = jnp.asarray(data)
        bwp = _stereo_native_bwp(size_x)
        expect = (2, 64, size_y // 16, bwp)
        if not (dv.ndim >= 4 and dv.shape[-4:] == expect):
            raise InvalidParameterError(
                f"native stereo data must have shape (..., 2, 64, "
                f"{size_y // 16}, {bwp}), got {dv.shape}")
        tier0 = select_backend(backend, pallas_interpret=pallas_interpret)
        if tier0 == "pallas" and not compat:
            from .kernels import pallas_dct as _pl
            if _pl.supports_mode("dec_quant_stereo", size_y, size_x):
                if dv.dtype != jnp.uint8:
                    raise InvalidParameterError(
                        f"record streams must be uint8, got {dv.dtype}")
                lut_arr = np.asarray(lut, np.float32).reshape(-1)
                if lut_arr.size != 64:
                    raise InvalidParameterError("lut must have 64 entries")
                return _maybe_batch(
                    dv, lambda vv: _pl.decode_quantize_stereo(
                        vv, jnp.asarray(lut_arr), size_x, size_y,
                        interpret=pallas_interpret, view_layout="native"),
                    numpy_tier=False, base_ndim=4)
        # other tiers: drop the pad columns and take the planar route
        data = dv[..., : size_x // 8]
        view_layout = "planar"
    if view_layout == "planar":
        dv = jnp.asarray(data)
        planar_ok = dv.ndim >= 4 and dv.shape[-4:] == (
            2, 64, size_y // 16, size_x // 8)
        if not planar_ok:
            raise InvalidParameterError(
                f"planar stereo data must have shape (..., 2, 64, "
                f"{size_y // 16}, {size_x // 8}), got {dv.shape}")
        tier0 = select_backend(backend, pallas_interpret=pallas_interpret)
        if tier0 == "pallas" and not compat:
            from .kernels import pallas_dct as _pl
            if _pl.supports_mode("dec_quant_stereo", size_y, size_x):
                if dv.dtype != jnp.uint8:
                    raise InvalidParameterError(
                        f"record streams must be uint8, got {dv.dtype}")
                lut_arr = np.asarray(lut, np.float32).reshape(-1)
                if lut_arr.size != 64:
                    raise InvalidParameterError("lut must have 64 entries")
                return _maybe_batch(
                    dv, lambda vv: _pl.decode_quantize_stereo(
                        vv, jnp.asarray(lut_arr), size_x, size_y,
                        interpret=pallas_interpret, view_layout="planar"),
                    numpy_tier=False, base_ndim=4)
        # other tiers: convert to the reference stream and fall through
        from .layout import reorder as _reorder
        data = _maybe_batch(
            dv, lambda vv: _reorder.stereo_views_to_interleaved(vv),
            numpy_tier=False, base_ndim=4)
    d, lut_arr = _validate_decode(data, lut, size_x, size_y, size_y * size_x)
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    if compat:
        if tier == "numpy":
            from . import native as _native
            return _maybe_batch(
                d, lambda dd: _native.decode_quantize_stereo(
                    np.asarray(dd), lut_arr, size_x, size_y),
                numpy_tier=True, base_ndim=1)
        from .kernels import compat as _compat
        return _maybe_batch(
            d, lambda dd: _compat.decode_quantize_stereo(dd, lut_arr,
                                                         size_x, size_y),
            numpy_tier=False, base_ndim=1)
    if tier == "numpy":
        return _maybe_batch(
            d, lambda dd: _golden.decode_quantize_stereo_golden(
                np.asarray(dd), lut_arr, size_x, size_y),
            numpy_tier=True, base_ndim=1)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("dec_quant_stereo", size_y, size_x):
            return _maybe_batch(
                d, lambda dd: _pl.decode_quantize_stereo(
                    dd, jnp.asarray(lut_arr), size_x, size_y,
                    interpret=pallas_interpret),
                numpy_tier=False, base_ndim=1)
    return _maybe_batch(
        d, lambda dd: _xla.decode_quantize_stereo(dd, jnp.asarray(lut_arr),
                                                  size_x, size_y),
        numpy_tier=False, base_ndim=1)


def roundtrip_quantize32(image, lut, *, backend: str | None = None,
                         pallas_interpret: bool = False):
    """Fused mode32 encode->decode of the TOP view (north-star round-trip;
    BASELINE config 4's per-frame DCT/quant/IDCT).  Returns (H/2, W) u8.
    Bit-identical to composing encode_quantize32 + decode_quantize32 on
    the same backend; fused to halve HBM traffic on the pallas tier."""
    img, lut_arr, h, w = _validate(image, lut, multiple_of_64=True)
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("roundtrip32", h, w):
            return _maybe_batch(
                img, lambda im: _pl.roundtrip_quantize32(
                    im, jnp.asarray(lut_arr), interpret=pallas_interpret),
                numpy_tier=False)
        tier = "xla"
    if tier == "numpy":
        def _one_np(im):
            enc = _golden.encode_quantize32_golden(np.asarray(im), lut_arr)
            return _golden.decode_quantize32_golden(enc, lut_arr, w, h)
        return _maybe_batch(img, _one_np, numpy_tier=True)

    def _one_xla(im):
        rec = _xla.encode_quantize32(im, jnp.asarray(lut_arr), 0, 1 << 30,
                                     "rne")
        return _xla.decode_quantize32(rec, jnp.asarray(lut_arr), w, h)
    return _maybe_batch(img, _one_xla, numpy_tier=False)


# ---------------------------------------------------------------------------
# YCbCr color pipeline (north-star addition; the reference is
# grayscale-only, src/simd_dct.h:29-31)
# ---------------------------------------------------------------------------

def _reject_numpy_tier_ycbcr(tier: str):
    """The color pipeline is a north-star extension with XLA as its
    portable tier; it has no NumPy golden.  An explicitly requested (or
    capped-to) numpy tier must fail loudly, not silently run XLA — the
    same contract as the reference's mode32 dispatch, whose NoSimd
    variant does not exist (returns NotSupported,
    src/simd_dct.cpp:127)."""
    if tier == "numpy":
        raise NotSupportedError(
            "the ycbcr pipeline has no numpy tier (xla is its most "
            "portable implementation)")


def _validate_color(planes, luma_lut, chroma_lut):
    p = jnp.asarray(planes)
    if p.ndim not in (3, 4) or p.shape[-3] != 3:
        raise InvalidParameterError(
            f"expected (3, H, W) planar RGB or a (B, 3, H, W) batch, "
            f"got shape {p.shape}")
    probe2d = p[..., 0, :, :].reshape(p.shape[-2:]) if p.ndim == 3 \
        else p[0, 0]
    _, lut_l, h, w = _validate(probe2d, luma_lut, multiple_of_64=True)
    _, lut_c, _, _ = _validate(probe2d, chroma_lut, multiple_of_64=True)
    return p, lut_l, lut_c, h, w


def _maybe_batch_color(p, fn_one):
    return fn_one(p) if p.ndim == 3 else jax.vmap(fn_one)(p)


def encode_quantize32_ycbcr(planes, luma_lut, chroma_lut, *,
                            rounding: str = "rne",
                            backend: str | None = None,
                            pallas_interpret: bool = False):
    """(3, H, W) u8 planar RGB -> (3, S*8W) u8 per-channel YCbCr mode32
    records (BT.601 full-range mix; Y quantized with ``luma_lut``, Cb/Cr
    with ``chroma_lut``; TOP view, dual-view convention).  On the pallas
    tier the color mix is fused into the kernel (kernels/color32); the
    XLA tier composes the identical math."""
    _check_rounding(rounding)
    p, lut_l, lut_c, h, w = _validate_color(planes, luma_lut, chroma_lut)
    from .kernels import color32 as _c32
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    _reject_numpy_tier_ycbcr(tier)
    top = p[..., : h // 2, :]
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("enc_quant32", h, w):
            return _maybe_batch_color(top, lambda t: _c32.enc32_rgb(
                t, jnp.asarray(lut_l), jnp.asarray(lut_c),
                rounding=rounding,
                interpret=pallas_interpret).reshape(3, -1))
    return _maybe_batch_color(top, lambda t: _c32.encode_ycbcr_xla(
        t, jnp.asarray(lut_l), jnp.asarray(lut_c),
        rounding=rounding).reshape(3, -1))


def decode_quantize32_ycbcr(data, luma_lut, chroma_lut,
                            size_x: int, size_y: int, *,
                            backend: str | None = None,
                            pallas_interpret: bool = False):
    """(3, S*8W) u8 YCbCr records -> (3, H/2, W) u8 planar RGB."""
    d = jnp.asarray(data)
    if d.dtype != jnp.uint8:
        raise InvalidParameterError(
            f"record streams must be uint8, got {d.dtype}")
    if size_x <= 0 or size_y <= 0:
        raise InvalidParameterError(
            f"invalid dimensions {(size_x, size_y)}")
    if size_y % 16:
        raise NotSupportedError(
            f"dual-view geometry requires H % 16 == 0, got H={size_y}")
    if size_x % 64:
        raise NotSupportedError(
            f"enc-quant32 requires W % 64 == 0, got {size_x}")
    expect = 3 * (size_y // 2) * size_x
    if d.size == 0 or d.size % expect:
        raise InvalidParameterError(
            f"expected a multiple of {expect} record bytes for "
            f"{(size_x, size_y)}, got {d.size}")
    batch = d.size // expect
    # a batched INPUT shape keeps its batch axis even for B == 1, so
    # decode stays shape-symmetric with the batched encode
    batched = batch > 1 or d.ndim >= 3
    records = d.reshape(batch, 3, (size_y // 2) // 8, 8 * size_x) \
        if batched else d.reshape(3, (size_y // 2) // 8, 8 * size_x)
    lut_l = np.asarray(luma_lut, np.float32).reshape(-1)
    lut_c = np.asarray(chroma_lut, np.float32).reshape(-1)
    if lut_l.size != 64 or lut_c.size != 64:
        raise InvalidParameterError("luts must have 64 entries")
    from .kernels import color32 as _c32
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    _reject_numpy_tier_ycbcr(tier)
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("dec_quant32", size_y, size_x):
            return _maybe_batch_color(records, lambda r: _c32.dec32_rgb(
                r, jnp.asarray(lut_l), jnp.asarray(lut_c),
                interpret=pallas_interpret))
    return _maybe_batch_color(records, lambda r: _c32.decode_ycbcr_xla(
        r, jnp.asarray(lut_l), jnp.asarray(lut_c)))


def roundtrip_quantize32_ycbcr(planes, luma_lut, chroma_lut, *,
                               backend: str | None = None,
                               pallas_interpret: bool = False):
    """(3, H, W) u8 planar RGB -> (3, H/2, W) u8: YCbCr mode32
    encode->decode round trip; fully fused on the pallas tier
    (coefficients never leave VMEM, 3+3 u8 bytes/px HBM traffic)."""
    p, lut_l, lut_c, h, w = _validate_color(planes, luma_lut, chroma_lut)
    from .kernels import color32 as _c32
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    _reject_numpy_tier_ycbcr(tier)
    top = p[..., : h // 2, :]
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("roundtrip32", h, w):
            return _maybe_batch_color(top, lambda t: _c32.rt32_rgb(
                t, jnp.asarray(lut_l), jnp.asarray(lut_c),
                interpret=pallas_interpret))

    def _one(t):
        rec = _c32.encode_ycbcr_xla(t, jnp.asarray(lut_l),
                                    jnp.asarray(lut_c))
        return _c32.decode_ycbcr_xla(rec, jnp.asarray(lut_l),
                                     jnp.asarray(lut_c))
    return _maybe_batch_color(top, _one)


# ---------------------------------------------------------------------------
# YCbCr 4:2:0 chroma-subsampled pipeline (north-star addition; halves
# chroma HBM bytes and record-stream size — see kernels/color420)
# ---------------------------------------------------------------------------

def _validate_420(planes, luma_lut, chroma_lut):
    p, lut_l, lut_c, h, w = _validate_color(planes, luma_lut, chroma_lut)
    # the half-res chroma planes must themselves satisfy the mode32
    # contract: W/2 % 64 and (H/2)/2 % 8
    if w % 128:
        raise NotSupportedError(
            f"enc-quant32-ycbcr420 requires W % 128 == 0 "
            f"(half-res chroma W/2 % 64), got {w}")
    if h % 32:
        raise NotSupportedError(
            f"enc-quant32-ycbcr420 requires H % 32 == 0 "
            f"(half-res chroma strips), got {h}")
    return p, lut_l, lut_c, h, w


def encode_quantize32_ycbcr420(planes, luma_lut, chroma_lut, *,
                               rounding: str = "rne",
                               backend: str | None = None,
                               pallas_interpret: bool = False):
    """(3, H, W) u8 planar RGB -> flat (1.5 * H/2 * W,) u8 4:2:0 record
    stream ``[Y records | Cb records | Cr records]`` (TOP view,
    dual-view convention).  Cb/Cr are 2x2-mean subsampled; on the
    pallas tier the subsample is folded into the chroma DCT bases
    (kernels/color420) so it costs no extra pass."""
    _check_rounding(rounding)
    p, lut_l, lut_c, h, w = _validate_420(planes, luma_lut, chroma_lut)
    from .kernels import color420 as _c420
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    _reject_numpy_tier_ycbcr(tier)
    top = p[..., : h // 2, :]
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        if _pl.supports_mode("enc_quant32", h, w):
            return _maybe_batch_color(top, lambda t: _c420.pack_records(
                *_c420.enc420_rgb(t, jnp.asarray(lut_l),
                                  jnp.asarray(lut_c), rounding=rounding,
                                  interpret=pallas_interpret)))
    return _maybe_batch_color(top, lambda t: _c420.pack_records(
        *_c420.encode_ycbcr420_xla(t, jnp.asarray(lut_l),
                                   jnp.asarray(lut_c), rounding=rounding)))


def decode_quantize32_ycbcr420(data, luma_lut, chroma_lut,
                               size_x: int, size_y: int, *,
                               backend: str | None = None,
                               pallas_interpret: bool = False):
    """Flat (1.5 * H/2 * W,) u8 4:2:0 record stream -> (3, H/2, W) u8
    planar RGB (chroma upsampled by 2x2 replication)."""
    d = jnp.asarray(data)
    if d.dtype != jnp.uint8:
        raise InvalidParameterError(
            f"record streams must be uint8, got {d.dtype}")
    if size_x <= 0 or size_y <= 0:
        raise InvalidParameterError(
            f"invalid dimensions {(size_x, size_y)}")
    if size_y % 32:
        raise NotSupportedError(
            f"ycbcr420 requires H % 32 == 0, got H={size_y}")
    if size_x % 128:
        raise NotSupportedError(
            f"ycbcr420 requires W % 128 == 0, got {size_x}")
    h2 = size_y // 2
    expect = (3 * h2 * size_x) // 2
    if d.size == 0 or d.size % expect:
        raise InvalidParameterError(
            f"expected a multiple of {expect} record bytes for "
            f"{(size_x, size_y)}, got {d.size}")
    batch = d.size // expect
    lut_l = np.asarray(luma_lut, np.float32).reshape(-1)
    lut_c = np.asarray(chroma_lut, np.float32).reshape(-1)
    if lut_l.size != 64 or lut_c.size != 64:
        raise InvalidParameterError("luts must have 64 entries")
    from .kernels import color420 as _c420
    tier = select_backend(backend, pallas_interpret=pallas_interpret)
    _reject_numpy_tier_ycbcr(tier)
    use_pallas = False
    if tier == "pallas":
        from .kernels import pallas_dct as _pl
        use_pallas = _pl.supports_mode("dec_quant32", size_y, size_x)

    def _one(flat):
        y_rec, c_rec = _c420.unpack_records(flat.reshape(-1), size_x, h2)
        if use_pallas:
            return _c420.dec420_rgb(y_rec, c_rec, jnp.asarray(lut_l),
                                    jnp.asarray(lut_c),
                                    interpret=pallas_interpret)
        return _c420.decode_ycbcr420_xla(y_rec, c_rec, jnp.asarray(lut_l),
                                         jnp.asarray(lut_c))
    if batch > 1:
        return jax.vmap(_one)(d.reshape(batch, expect))
    return _one(d)


# ---------------------------------------------------------------------------
# C-enum-style wrappers
# ---------------------------------------------------------------------------
#
# Strip-range semantics: the functional (raising) encode entry points
# return a FRESH array with excluded strips zero-filled (a documented
# deviation — a pure function has no caller buffer to leave untouched).
# The try_* wrappers below restore exact reference behavior: they copy
# only the included strips' bytes into ``out``, leaving excluded bytes
# untouched (≙ the skip/advance-cursor writes of src/simd_dct.cpp:
# 1075-1083), so two partial passes compose like two reference calls.


def _strip_byte_mask(mode: str, h: int, w: int, start_y, end_y,
                     legacy_range: bool = False,
                     spill: bool = False,
                     pair_spill: bool = False) -> np.ndarray | None:
    """Bool mask over the output bytes actually written for the strip
    range, or None when every strip is included.  ``spill`` sizes the
    mask for the H % 16 == 8 spill geometry (one extra strip crossing
    the dual-view boundary, ≙ the encode entry points' spill=True).
    ``pair_spill``: the as-written layout's last cell per strip stores
    64 bytes into the FOLLOWING strip's first-cell region
    (src/simd_dct.cpp:1662-1670 overlap) — an included strip therefore
    also writes the first 64 bytes of an excluded successor."""
    n_strips = -(-h // 16) if (spill and h % 16) else h // 16
    s = np.arange(n_strips)
    cmp = s * 8 if legacy_range else s * 16
    ey = _END_Y_SENTINEL if end_y is None else int(end_y)
    strips = (cmp >= int(start_y)) & (cmp <= ey)
    if strips.all():
        return None
    if mode == "stereo":
        # per plane, each strip owns w/4 bytes (left + right interleave,
        # src/simd_dct.cpp:275); 64 planes
        return np.tile(np.repeat(strips, w // 4), 64)
    mask = np.repeat(strips, 8 * w)
    if pair_spill:
        spill_into = np.zeros_like(strips)
        spill_into[1:] = strips[:-1] & ~strips[1:]
        for r in np.nonzero(spill_into)[0]:
            mask[r * 8 * w: r * 8 * w + 64] = True
    return mask


def try_encode_quantize(image, out, lut, size_x, size_y, start_y, end_y,
                        **kw) -> SimdDctResult:
    """Reference-shaped call: writes into ``out`` (np.uint8, H/2*W) and
    returns a SimdDctResult instead of raising.  Bytes of strips outside
    [start_y, end_y] are left untouched, like the reference."""
    try:
        result = encode_quantize(image, lut, start_y, end_y, **kw)
    except SimdDctError as e:
        return e.result
    mask = _strip_byte_mask(
        "quant", size_y, size_x, start_y, end_y,
        kw.get("legacy_range", False), spill=kw.get("spill", False),
        pair_spill=kw.get("layout") == "pair_as_written")
    if mask is None:
        np.copyto(out, np.asarray(result))
    else:
        np.copyto(out, np.asarray(result), where=mask)
    return SimdDctResult.SUCCESS


def try_encode_quantize32(image, out, lut, size_x, size_y, start_y, end_y,
                          **kw) -> SimdDctResult:
    try:
        result = encode_quantize32(image, lut, start_y, end_y, **kw)
    except SimdDctError as e:
        return e.result
    mask = _strip_byte_mask("quant32", size_y, size_x, start_y, end_y,
                            spill=kw.get("spill", False))
    if mask is None:
        np.copyto(out, np.asarray(result))
    else:
        np.copyto(out, np.asarray(result), where=mask)
    return SimdDctResult.SUCCESS


def try_encode_quantize_stereo(image, out, lut, size_x, size_y, start_y, end_y,
                               **kw) -> SimdDctResult:
    try:
        result = encode_quantize_stereo(image, lut, start_y, end_y, **kw)
    except SimdDctError as e:
        return e.result
    mask = _strip_byte_mask("stereo", size_y, size_x, start_y, end_y)
    if mask is None:
        np.copyto(out, np.asarray(result))
    else:
        np.copyto(out, np.asarray(result), where=mask)
    return SimdDctResult.SUCCESS
