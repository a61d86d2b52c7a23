"""Pallas tier mode registry — the api layer's fast-path lookup.

Exposes mode entry points with the same signatures as the XLA tier for
every mode that has a Pallas fast path AND whose geometry the kernels
support (panel-aligned: H/2 % 128 == 0, W % 128 == 0); api.py falls back
to the XLA tier otherwise (mirroring the reference's ISA dispatch
cascade, src/simd_dct.cpp:78-85).

* enc-quant32 encode/decode and the fused round-trip run fully in-kernel
  (byte records assembled by basis permutation + slice/concat stores).
* enc-quant and stereo use the HYBRID path: the Pallas tile kernel does
  all compute with aligned stores, and kernels.panel's XLA permutes
  assemble the byte records (their lane-granular u8 interleaves are not
  lowerable in Mosaic).
"""

from __future__ import annotations

from . import pallas_dct


def supports(mode: str, h: int, w: int) -> bool:
    return pallas_dct.supports(h, w)


def encode_quantize32(img, lut, start_y=0, end_y=1 << 30, rounding="rne"):
    return pallas_dct.encode_quantize32(img, lut, start_y, end_y, rounding)


def decode_quantize32(data, lut, size_x, size_y):
    return pallas_dct.decode_quantize32(data, lut, size_x, size_y)


def roundtrip_quantize32(img, lut):
    return pallas_dct.roundtrip_quantize32(img, lut)


def encode_quantize(img, lut, start_y=0, end_y=1 << 30, rounding="rne",
                    layout="scalar", legacy_range=False):
    return pallas_dct.encode_quantize(img, lut, start_y, end_y, rounding,
                                      layout, legacy_range)


def decode_quantize(data, lut, size_x, size_y, layout="scalar"):
    return pallas_dct.decode_quantize(data, lut, size_x, size_y, layout)


def encode_quantize_stereo(img, lut, start_y=0, end_y=1 << 30,
                           rounding="rne"):
    return pallas_dct.encode_quantize_stereo(img, lut, start_y, end_y,
                                             rounding)


def decode_quantize_stereo(data, lut, size_x, size_y):
    return pallas_dct.decode_quantize_stereo(data, lut, size_x, size_y)
