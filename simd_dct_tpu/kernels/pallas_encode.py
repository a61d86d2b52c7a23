"""Pallas tier mode registry — the api layer's fast-path lookup.

Exposes mode entry points with the same signatures as the XLA tier for
every mode that has a fused Pallas kernel AND whose geometry the kernel
supports; api.py falls back to the XLA tier otherwise (mirroring the
reference's ISA dispatch cascade, src/simd_dct.cpp:78-85, where a mode
without a kernel for the best ISA drops to the next tier).

Currently Pallas-accelerated: enc-quant32 encode + decode (the reference's
own speed-of-light mode, SURVEY.md §3.2).  enc-quant / stereo run on the
XLA panel engine (Mosaic today cannot lower the lane-minor u8 interleaves
those byte layouts need in-kernel; see kernels/pallas_dct.py docstring).
"""

from __future__ import annotations

from . import pallas_dct


def supports(mode: str, h: int, w: int) -> bool:
    if mode in ("enc_quant32", "dec_quant32", "roundtrip32"):
        return pallas_dct.supports(h, w)
    return False


def encode_quantize32(img, lut, start_y=0, end_y=1 << 30, rounding="rne"):
    return pallas_dct.encode_quantize32(img, lut, start_y, end_y, rounding)


def decode_quantize32(data, lut, size_x, size_y):
    return pallas_dct.decode_quantize32(data, lut, size_x, size_y)


def roundtrip_quantize32(img, lut):
    return pallas_dct.roundtrip_quantize32(img, lut)
