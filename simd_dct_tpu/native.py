"""ctypes bridge to the native C++ golden oracle (native/golden_dct.cpp).

The reference is a C/C++ library; the TPU framework keeps a native C++
golden implementation of the scalar encode semantics as its bit-exactness
oracle (SURVEY.md §7 "Hard parts": bit-exact must be defined against the
documented math, verified via a C++ golden built WITHOUT fast-math).

The shared object is built on demand with g++ (no fast-math, -O2) and
cached next to the source; rebuilds happen automatically when the source
is newer than the cached .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "golden_dct.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libgolden_dct.so")

_lock = threading.Lock()
_lib = None

ROUNDING_CODE = {"rne": 0, "scalar": 1, "clamp_first": 2}
LAYOUT_CODE = {"scalar": 0, "pair": 1, "pair_as_written": 2}

RESULT_NAMES = {0: "success", 1: "invalid_parameter", 2: "not_supported"}


class NativeGoldenError(RuntimeError):
    def __init__(self, code: int):
        self.code = code
        super().__init__(f"native golden returned {RESULT_NAMES.get(code, code)}")


def _build() -> str:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        # compile to a temp path and rename into place: atomic against
        # concurrent builders (pytest-xdist, shared checkouts) and never
        # truncates a .so another process has mmapped
        tmp = f"{_SO}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
            # Explicitly strict FP: the whole point of this oracle.
            "-fno-fast-math", "-ffp-contract=off", "-frounding-math",
            _SRC, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            st = ctypes.c_size_t
            for name in ("golden_encode_quantize",):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [u8p, u8p, f32p, st, st, st, st,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int]
            for name in ("golden_encode_quantize32",
                         "golden_encode_quantize_stereo"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [u8p, u8p, f32p, st, st, st, st, ctypes.c_int]
            for name in ("golden_decode_quantize32",
                         "golden_decode_quantize_stereo"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [u8p, u8p, f32p, st, st]
            fn = lib.golden_decode_quantize
            fn.restype = ctypes.c_int
            fn.argtypes = [u8p, u8p, f32p, st, st, ctypes.c_int]
            for name in ("golden_dct2d_fx_major", "golden_dct2d_fy_major"):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [f32p, st]
            _lib = lib
    return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _prep(image, lut):
    img = np.ascontiguousarray(image, np.uint8)
    lut = np.ascontiguousarray(lut, np.float32)
    if lut.size != 64:
        raise ValueError("lut must have 64 entries")
    return img, lut


def encode_quantize(image, lut, start_y=0, end_y=None, *,
                    rounding="rne", layout="scalar",
                    legacy_range=False, out=None) -> np.ndarray:
    """``out`` (optional caller buffer, u8 H/2*W): like the reference,
    bytes of strips outside [start_y, end_y] are left untouched."""
    img, lut = _prep(image, lut)
    h, w = img.shape
    end_y = h if end_y is None else end_y
    if out is None:
        # H % 16 == 8: the reference's last strip spills past the view
        # boundary and writes ceil((h/2)/8)*8*w bytes (see oracle note).
        out = np.zeros(-(-(h // 2) // 8) * 8 * w, np.uint8)
    rc = _load().golden_encode_quantize(
        _u8p(img), _u8p(out), _f32p(lut), w, h, start_y, end_y,
        ROUNDING_CODE[rounding], LAYOUT_CODE[layout], int(legacy_range))
    if rc:
        raise NativeGoldenError(rc)
    return out


def encode_quantize32(image, lut, start_y=0, end_y=None, *,
                      rounding="rne", out=None) -> np.ndarray:
    img, lut = _prep(image, lut)
    h, w = img.shape
    end_y = h if end_y is None else end_y
    if out is None:
        out = np.zeros(-(-(h // 2) // 8) * 8 * w, np.uint8)
    rc = _load().golden_encode_quantize32(
        _u8p(img), _u8p(out), _f32p(lut), w, h, start_y, end_y,
        ROUNDING_CODE[rounding])
    if rc:
        raise NativeGoldenError(rc)
    return out


def encode_quantize_stereo(image, lut, start_y=0, end_y=None, *,
                           rounding="rne", out=None) -> np.ndarray:
    img, lut = _prep(image, lut)
    h, w = img.shape
    end_y = h if end_y is None else end_y
    if out is None:
        out = np.zeros(h * w, np.uint8)
    rc = _load().golden_encode_quantize_stereo(
        _u8p(img), _u8p(out), _f32p(lut), w, h, start_y, end_y,
        ROUNDING_CODE[rounding])
    if rc:
        raise NativeGoldenError(rc)
    return out


def decode_quantize(data, lut, size_x: int, size_y: int,
                    layout: str = "scalar") -> np.ndarray:
    """Native decode oracle for enc-quant (north-star inverse; the
    overlapping ``pair_as_written`` layout is not decodable)."""
    d = np.ascontiguousarray(data, np.uint8).reshape(-1)
    lut = np.ascontiguousarray(lut, np.float32)
    out = np.zeros((size_y // 2, size_x), np.uint8)
    rc = _load().golden_decode_quantize(
        _u8p(d), _u8p(out), _f32p(lut), size_x, size_y, LAYOUT_CODE[layout])
    if rc:
        raise NativeGoldenError(rc)
    return out


def decode_quantize32(data, lut, size_x: int, size_y: int) -> np.ndarray:
    """Native decode oracle for mode32 (north-star inverse)."""
    d = np.ascontiguousarray(data, np.uint8).reshape(-1)
    lut = np.ascontiguousarray(lut, np.float32)
    out = np.zeros((size_y // 2, size_x), np.uint8)
    rc = _load().golden_decode_quantize32(
        _u8p(d), _u8p(out), _f32p(lut), size_x, size_y)
    if rc:
        raise NativeGoldenError(rc)
    return out


def decode_quantize_stereo(data, lut, size_x: int, size_y: int) -> np.ndarray:
    d = np.ascontiguousarray(data, np.uint8).reshape(-1)
    lut = np.ascontiguousarray(lut, np.float32)
    out = np.zeros((size_y, size_x), np.uint8)
    rc = _load().golden_decode_quantize_stereo(
        _u8p(d), _u8p(out), _f32p(lut), size_x, size_y)
    if rc:
        raise NativeGoldenError(rc)
    return out


def dct2d_blocks(blocks: np.ndarray, orientation: str = "fy") -> np.ndarray:
    """Butterfly 2-D DCT on (..., 64) f32 block buffers (in reference
    association order). orientation 'fx' = enc-quant buffer order,
    'fy' = stereo/mode32 order."""
    b = np.ascontiguousarray(blocks, np.float32).copy()
    flat = b.reshape(-1, 64)
    fn = (_load().golden_dct2d_fx_major if orientation == "fx"
          else _load().golden_dct2d_fy_major)
    fn(_f32p(flat), flat.shape[0])
    return flat.reshape(b.shape)
