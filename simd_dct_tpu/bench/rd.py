"""Rate-distortion sweep: quality -> (bits/px, PSNR) over the full
codec pipeline (fused encode -> entropy pack for the rate; decode ->
PSNR vs source for the distortion).

North-star tooling beyond the reference (which stops at wall-clock
stats): a codec framework needs an RD view to pick operating points.
Runs on any tier (CPU ok — rates/PSNR are tier-independent up to the
documented ±1-byte contract).

    from simd_dct_tpu.bench.rd import rd_curve
    rows = rd_curve(img, qualities=(50, 75, 100, 150, 200))

    python -m simd_dct_tpu.bench.rd image.raw W H [--mode enc-quant32]
        [--qualities 50,75,100,150,200] [--rle] [--sparse]
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class RDPoint:
    quality: float
    bits_per_px: float      # entropy-packed record bits per SOURCE pixel
    raw_bits_per_px: float  # unpacked record bits per source pixel
    psnr_db: float          # decode vs the pixels the mode covers
    rail_frac: float = 0.0  # record bytes clipped at the 0/255 rails —
    #                         nonzero means this point sits in the
    #                         clipping regime where PSNR bends
    #                         non-monotonically (content-dependent; the
    #                         base table rails around q<~50-100)

    def row(self) -> str:
        rail = (f" | rail {self.rail_frac:.2%}" if self.rail_frac
                else "")
        return (f"q={self.quality:<6g} | {self.bits_per_px:6.3f} bpp "
                f"(raw {self.raw_bits_per_px:5.2f}) | "
                f"PSNR {self.psnr_db:6.2f} dB" + rail)


_MODES = ("enc-quant", "enc-quant-pair", "enc-quant32",
          "enc-quant-stereo", "enc-quant32-ycbcr", "enc-quant32-ycbcr420")


def _pipeline(mode: str, img: np.ndarray, quality: float, backend):
    """(records ndarray, decoded ndarray, covered source pixels)."""
    import jax.numpy as jnp

    from .. import api
    from ..core.quantize import default_quant_lut

    lut = default_quant_lut(quality)
    h, w = img.shape[-2], img.shape[-1]
    kw = dict(backend=backend)
    if mode in ("enc-quant", "enc-quant-pair"):
        layout = "pair" if mode.endswith("pair") else "scalar"
        rec = api.encode_quantize(img, lut, layout=layout, **kw)
        dec = api.decode_quantize(rec, lut, w, h, layout=layout, **kw)
        src = img[: h // 2]
    elif mode == "enc-quant32":
        rec = api.encode_quantize32(img, lut * 255.0, **kw)
        dec = api.decode_quantize32(rec, lut * 255.0, w, h, **kw)
        src = img[: h // 2]
    elif mode == "enc-quant-stereo":
        rec = api.encode_quantize_stereo(img, lut, **kw)
        dec = api.decode_quantize_stereo(rec, lut, w, h, **kw)
        src = img
    else:
        from ..layout.color import BASE_CHROMA_QUANT_TABLE
        chroma = jnp.asarray(BASE_CHROMA_QUANT_TABLE * quality * 255.0)
        enc = (api.encode_quantize32_ycbcr420 if mode.endswith("420")
               else api.encode_quantize32_ycbcr)
        decf = (api.decode_quantize32_ycbcr420 if mode.endswith("420")
                else api.decode_quantize32_ycbcr)
        rec = enc(img, lut * 255.0, chroma, **kw)
        dec = decf(rec, lut * 255.0, chroma, w, h, **kw)
        src = img[:, : h // 2]
    return rec, np.asarray(dec), np.asarray(src)


def rd_curve(img, qualities=(50, 75, 100, 150, 200), *,
             mode: str = "enc-quant32", rle: bool = False,
             sparse: bool = False, backend: str | None = None):
    """Sweep ``qualities`` and return a list of :class:`RDPoint`.

    ``img``: (H, W) u8 (or (3, H, W) planar RGB for the ycbcr modes),
    reference dual-view geometry.  Rate = entropy-packed record bytes
    (``rle``/``sparse`` select the stream format) per SOURCE pixel the
    mode covers; distortion = PSNR of the decode against those pixels.

    Quality convention (reference quirk, src/main.cpp:214-217): the
    number MULTIPLIES the quant table, so LARGER quality = coarser
    quantization = fewer bits AND lower PSNR.  Values well below ~50
    amplify coefficients into the record's ±127 clamp (clipping: PSNR
    collapses while entropy rises) — the useful sweep runs upward from
    ~50.
    """
    from .. import entropy
    from ..utils.metrics import psnr

    if mode not in _MODES:
        from ..api import InvalidParameterError
        raise InvalidParameterError(
            f"mode must be one of {_MODES}, got {mode!r}")
    img = np.asarray(img)
    out = []
    for q in qualities:
        rec, dec, src = _pipeline(mode, img, float(q), backend)
        if isinstance(rec, tuple):          # 420: (y_records, c_records)
            flat = np.concatenate([np.asarray(r).reshape(-1) for r in rec])
        else:
            flat = np.asarray(rec).reshape(-1)
        # RD curves report the ratio-optimal coding: keep the plain
        # pack on dense points (dense_fast trades ~20% ratio for pack
        # fps, which an RD sweep must not silently fold in)
        packed = (entropy.compress_sparse(flat, rle=rle,
                                          dense_fast=False) if sparse
                  else entropy.compress_records(flat, rle=rle))
        npx = src.size
        out.append(RDPoint(
            quality=float(q),
            bits_per_px=8.0 * packed.size / npx,
            raw_bits_per_px=8.0 * flat.size / npx,
            psnr_db=float(psnr(dec, src)),
            rail_frac=float(((flat == 0) | (flat == 255)).mean()),
        ))
    return out


def _main(argv=None) -> int:
    import argparse

    from ..dispatch.capability import honor_cpu_platform_env
    honor_cpu_platform_env()

    p = argparse.ArgumentParser(prog="simd_dct_tpu.bench.rd")
    p.add_argument("file")
    p.add_argument("width", type=int)
    p.add_argument("height", type=int)
    p.add_argument("--mode", choices=_MODES, default="enc-quant32")
    p.add_argument("--qualities", default="50,75,100,150,200")
    p.add_argument("--rle", action="store_true")
    p.add_argument("--sparse", action="store_true")
    args = p.parse_args(argv)

    w, h = args.width, args.height
    data = np.fromfile(args.file, np.uint8)
    if args.mode.startswith("enc-quant32-ycbcr"):
        img = data[: 3 * h * w].reshape(3, h, w)
    else:
        img = data[: h * w].reshape(h, w)
    qs = [float(x) for x in args.qualities.split(",") if x]
    for pt in rd_curve(img, qs, mode=args.mode, rle=args.rle,
                       sparse=args.sparse):
        print(pt.row())
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
