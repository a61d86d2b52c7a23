"""Self-describing container for encoded frames (.sdt).

North-star extension: the reference emits bare record buffers whose
geometry, mode, and quant table must travel out of band (its CLI dumps
``sizeX*sizeY`` raw bytes, src/main.cpp:594-606, and decoding them is
impossible anyway — the reference has no decoder).  A complete codec
needs a self-contained stream: this module frames the quantized records
(raw or entropy-packed) with everything ``decode`` needs — mode,
geometry, rounding, strip range, and the exact f32 quant table(s).

Layout (little-endian), version 1::

    u32  magic "SDTC" | u16 version | u8 mode | u8 rounding
    u32  size_x | u32 size_y | u32 start_y | u32 end_y
    u8   flags (bit0 entropy-packed, bit1 has chroma LUT) | u8 pad[3]
    f32  luma_lut[64]
    f32  chroma_lut[64]          -- only when flags bit1
    u64  payload_bytes | payload

The payload is the mode's record buffer, optionally wrapped by
``entropy.compress_records`` (any of its stream formats; the entropy
header is itself self-describing).  LUTs are stored in the DOMAIN THE
MODE USES (mode32/ycbcr: the raw 0..255-domain table, i.e. 255x the
normalized one — reference quirk, src/simd_dct.cpp:2033-2036), so
decode applies them verbatim.
"""

from __future__ import annotations

import dataclasses
import struct
import sys

import numpy as np

from . import entropy

MAGIC = b"SDTC"
VERSION = 1

MODES = ("enc-quant", "enc-quant-pair", "enc-quant32", "enc-quant-stereo",
         "enc-quant32-ycbcr", "enc-quant32-ycbcr420")
_ROUNDINGS = ("rne", "scalar", "clamp_first")

_FLAG_PACKED = 1
_FLAG_CHROMA = 2
# stereo payload stores the two views' plane segments SEPARATELY
# ((2, 64, S, W/8) row-major) — the separate-views layout, which skips
# the view-interleave epilogue on encode AND decode; bit unset = the
# reference's interleaved plane stream (compat default)
_FLAG_STEREO_PLANAR = 4
# stereo payload is the TPU-native record format: (2, 64, S, BWP)
# row-major with BWP = ceil(W/8/128)*128 and 127-valued pad columns —
# plane rows DMA at full speed (128-multiple minor dim; round 5)
_FLAG_STEREO_NATIVE = 8

_FIXED = struct.Struct("<4sHBBIIIIB3x")


class ContainerError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class FrameMeta:
    """Everything needed to decode the payload."""
    mode: str
    size_x: int
    size_y: int
    luma_lut: np.ndarray                  # f32[64], mode's native domain
    chroma_lut: np.ndarray | None = None  # f32[64] for ycbcr
    rounding: str = "rne"
    start_y: int = 0
    end_y: int | None = None
    packed: bool = False                  # payload is an entropy stream
    stereo_planar: bool = False           # stereo views stored separately
    stereo_native: bool = False           # 128-multiple padded plane rows


def pack(payload, meta: FrameMeta) -> np.ndarray:
    """Frame a record buffer (or entropy blob) into a .sdt container."""
    if meta.mode not in MODES:
        raise ContainerError(f"mode must be one of {MODES}")
    if meta.rounding not in _ROUNDINGS:
        raise ContainerError(f"rounding must be one of {_ROUNDINGS}")
    luma = np.ascontiguousarray(meta.luma_lut, np.float32).reshape(-1)
    if luma.size != 64:
        raise ContainerError("luma_lut must have 64 entries")
    flags = (_FLAG_PACKED if meta.packed else 0)
    if meta.stereo_planar and meta.stereo_native:
        raise ContainerError(
            "stereo_planar and stereo_native are mutually exclusive")
    if meta.stereo_planar or meta.stereo_native:
        if meta.mode != "enc-quant-stereo":
            raise ContainerError(
                "stereo view layouts only apply to enc-quant-stereo")
        flags |= (_FLAG_STEREO_PLANAR if meta.stereo_planar
                  else _FLAG_STEREO_NATIVE)
    chroma = b""
    if meta.chroma_lut is not None:
        c = np.ascontiguousarray(meta.chroma_lut, np.float32).reshape(-1)
        if c.size != 64:
            raise ContainerError("chroma_lut must have 64 entries")
        flags |= _FLAG_CHROMA
        chroma = c.tobytes()
    data = entropy.as_u8_stream(payload)
    end_y = meta.size_y if meta.end_y is None else meta.end_y
    head = _FIXED.pack(MAGIC, VERSION, MODES.index(meta.mode),
                       _ROUNDINGS.index(meta.rounding),
                       meta.size_x, meta.size_y, meta.start_y, end_y,
                       flags)
    blob = head + luma.tobytes() + chroma + struct.pack("<Q", data.size)
    return np.concatenate([np.frombuffer(blob, np.uint8), data])


def unpack(blob) -> tuple[np.ndarray, FrameMeta]:
    """Container -> (payload bytes, FrameMeta).  Untrusted input: every
    header field is validated before use."""
    data = entropy.as_u8_stream(blob)
    if data.size < _FIXED.size:
        raise ContainerError("container too short")
    (magic, ver, mode_i, rounding_i, size_x, size_y, start_y, end_y,
     flags) = _FIXED.unpack_from(data[:_FIXED.size].tobytes())
    if magic != MAGIC:
        raise ContainerError("bad container magic")
    if ver != VERSION:
        raise ContainerError(f"unsupported container version {ver}")
    if mode_i >= len(MODES) or rounding_i >= len(_ROUNDINGS):
        raise ContainerError("corrupt container header")
    pos = _FIXED.size
    if data.size < pos + 4 * 64:
        raise ContainerError("container too short")
    luma = np.frombuffer(data[pos:pos + 256].tobytes(), np.float32).copy()
    pos += 256
    chroma = None
    if flags & _FLAG_CHROMA:
        if data.size < pos + 256:
            raise ContainerError("container too short")
        chroma = np.frombuffer(data[pos:pos + 256].tobytes(),
                               np.float32).copy()
        pos += 256
    if data.size < pos + 8:
        raise ContainerError("container too short")
    (n,) = struct.unpack("<Q", data[pos:pos + 8].tobytes())
    pos += 8
    if n != data.size - pos:
        raise ContainerError("corrupt container: payload size mismatch")
    meta = FrameMeta(mode=MODES[mode_i], size_x=size_x, size_y=size_y,
                     luma_lut=luma, chroma_lut=chroma,
                     rounding=_ROUNDINGS[rounding_i],
                     start_y=start_y, end_y=end_y,
                     packed=bool(flags & _FLAG_PACKED),
                     stereo_planar=bool(flags & _FLAG_STEREO_PLANAR),
                     stereo_native=bool(flags & _FLAG_STEREO_NATIVE))
    if meta.stereo_planar and meta.stereo_native:
        raise ContainerError("corrupt container: both stereo layout bits")
    # copy: the slice would otherwise alias the caller's blob (mutable
    # bytearray input -> later caller mutation silently corrupts the
    # payload; bytes input -> read-only array surprises mutating callers)
    return data[pos:].copy(), meta


# ---------------------------------------------------------------------------
# high-level: image <-> container
# ---------------------------------------------------------------------------

def _encode_records(image, mode: str, quality, rounding: str, backend,
                    start_y: int = 0, end_y: int | None = None,
                    view_layout: str = "interleaved"):
    """Shared mode ladder for encode/encode_video: image (or a batched
    form) -> (records, luma_lut, chroma_lut) with the per-mode LUT
    domain conventions applied."""
    from . import api
    from .core.quantize import default_quant_lut
    from .layout.color import BASE_CHROMA_QUANT_TABLE

    lut = default_quant_lut(quality)
    kw = dict(rounding=rounding, backend=backend)
    if mode == "enc-quant":
        return api.encode_quantize(image, lut, start_y, end_y,
                                   layout="scalar", **kw), lut, None
    if mode == "enc-quant-pair":
        return api.encode_quantize(image, lut, start_y, end_y,
                                   layout="pair", **kw), lut, None
    if mode == "enc-quant32":
        luma = lut * np.float32(255.0)
        return api.encode_quantize32(image, luma, start_y, end_y,
                                     **kw), luma, None
    if mode == "enc-quant-stereo":
        return api.encode_quantize_stereo(image, lut, start_y, end_y,
                                          view_layout=view_layout,
                                          **kw), lut, None
    if view_layout != "interleaved":
        raise ContainerError(
            "view_layout only applies to enc-quant-stereo")
    if mode in ("enc-quant32-ycbcr", "enc-quant32-ycbcr420"):
        if start_y != 0 or (end_y is not None
                            and end_y < np.asarray(image).shape[-2]):
            # the color pipeline has no strip-range form; a header
            # recording an unapplied range would lie to consumers
            raise ContainerError(
                f"{mode} does not support a start_y/end_y range")
        luma = lut * np.float32(255.0)
        q = 1.0 if quality is None else quality
        chroma = (BASE_CHROMA_QUANT_TABLE * q * 255.0).astype(np.float32)
        fn = (api.encode_quantize32_ycbcr420 if mode.endswith("420")
              else api.encode_quantize32_ycbcr)
        return fn(image, luma, chroma, rounding=rounding,
                  backend=backend), luma, chroma
    raise ContainerError(f"mode must be one of {MODES}")


def encode(image, mode: str = "enc-quant32", *, quality: float | None = None,
           rounding: str = "rne", compress: bool = True, rle: bool = False,
           sparse: bool = False,
           start_y: int = 0, end_y: int | None = None,
           backend: str | None = None,
           view_layout: str = "interleaved") -> np.ndarray:
    """u8 image (or (3,H,W) planes for ycbcr) -> self-contained .sdt
    container.  ``compress`` wraps the records in the entropy coder;
    ``sparse=True`` precompacts all-127 64-byte blocks on the DEVICE
    first (SDS1 — the host packs only significant blocks; dense inputs
    fall back transparently and ``decode`` needs no flag).
    ``view_layout='planar'`` (stereo only) stores the two views' plane
    segments separately — the fused kernel's native layout, skipping the
    view-interleave on encode AND decode; the flag travels in the
    header so ``decode`` dispatches transparently."""
    from . import entropy

    h = int(np.asarray(image).shape[-2])
    w = int(np.asarray(image).shape[-1])
    rec, luma, chroma = _encode_records(image, mode, quality, rounding,
                                        backend, start_y, end_y,
                                        view_layout=view_layout)
    if compress and sparse:
        # keep device-resident records on device: the SDS1 compaction
        # gathers run there, so only the kept blocks (plus bitmap) cross
        # the host boundary — not the full record stream
        payload = entropy.compress_sparse(rec.reshape(-1), rle=rle)
    else:
        rec = np.asarray(rec).reshape(-1)
        payload = entropy.compress_records(rec, rle=rle) if compress \
            else rec
    meta = FrameMeta(mode=mode, size_x=w, size_y=h, luma_lut=luma,
                     chroma_lut=chroma, rounding=rounding,
                     start_y=start_y, end_y=end_y, packed=compress,
                     stereo_planar=(view_layout == "planar"),
                     stereo_native=(view_layout == "native"))
    return pack(payload, meta)


def decode(blob, *, backend: str | None = None, compat: bool = False):
    """.sdt container -> decoded u8 image (top view; stereo returns the
    full dual view, ycbcr returns (3, H/2, W) RGB planes).  On device
    tiers, SDN1/SDS1 payloads expand ON DEVICE (~0.65x the upload
    bytes; round 5)."""
    from . import entropy

    payload, m = unpack(blob)
    if not m.packed:
        rec = payload
    elif backend == "numpy":
        rec = entropy.decompress(payload)
    else:
        rec = entropy.decompress_to_device(payload)
    return _decode_records(rec, m, backend, compat)


def info(blob) -> FrameMeta:
    """Header-only parse (payload untouched)."""
    return unpack(blob)[1]


# ---------------------------------------------------------------------------
# video container: N frames, per-frame payloads (random access), shared
# Huffman statistics
# ---------------------------------------------------------------------------

MAGIC_V = b"SDTV"

_FIXED_V = struct.Struct("<4sHBBIIIB3x")


@dataclasses.dataclass(frozen=True)
class VideoMeta:
    mode: str
    size_x: int
    size_y: int
    n_frames: int
    luma_lut: np.ndarray
    chroma_lut: np.ndarray | None = None
    rounding: str = "rne"
    packed: bool = False
    stereo_planar: bool = False
    stereo_native: bool = False


def encode_video(frames, mode: str = "enc-quant32", *,
                 quality: float | None = None, rounding: str = "rne",
                 compress: bool = True, rle: bool = False,
                 sparse: bool = False,
                 backend: str | None = None,
                 view_layout: str = "interleaved") -> np.ndarray:
    """u8 frame batch (B,H,W) — or (B,3,H,W) planes for ycbcr — ->
    self-contained .sdtv container.  Frames are encoded through the
    batched api forms (one device dispatch), then each frame's records
    are entropy-packed separately (per-frame payload table => frame
    random access) with ONE Huffman table built from the whole batch's
    statistics (``rle=True`` streams stay per-frame self-contained)."""
    from . import entropy

    arr = np.asarray(frames)
    is_color = mode in ("enc-quant32-ycbcr", "enc-quant32-ycbcr420")
    want = 4 if is_color else 3
    if arr.ndim != want:
        raise ContainerError(
            f"{mode} expects a {want}-D frame batch, got shape {arr.shape}")
    b = arr.shape[0]
    if b == 0:
        raise ContainerError("empty frame batch")
    h, w = int(arr.shape[-2]), int(arr.shape[-1])
    rec, luma, chroma = _encode_records(arr, mode, quality, rounding,
                                        backend, view_layout=view_layout)
    if compress and sparse:
        # per-frame SDS1 streams (random access preserved); the
        # significance counts for the whole batch come from ONE device
        # dispatch, and device-resident records STAY on device through
        # the compaction gathers — only kept blocks cross to the host
        payloads = entropy.compress_sparse_batch(rec.reshape(b, -1),
                                                 rle=rle)
    else:
        rec = np.asarray(rec).reshape(b, -1)
        if not compress:
            payloads = [rec[i] for i in range(b)]
        elif rle:
            payloads = [entropy.compress(rec[i], rle=True) for i in range(b)]
        else:
            # one table from the whole batch's statistics (device-side
            # histogram of all frames in one pass)
            lengths = entropy.build_lengths(entropy.histogram(rec))
            k = entropy.default_chunks(rec[0].size)
            payloads = [entropy.compress(rec[i], lengths, streams=k)
                        for i in range(b)]

    flags = (_FLAG_PACKED if compress else 0) \
        | (_FLAG_STEREO_PLANAR if view_layout == "planar" else 0) \
        | (_FLAG_STEREO_NATIVE if view_layout == "native" else 0)
    parts = [_FIXED_V.pack(MAGIC_V, VERSION, MODES.index(mode),
                           _ROUNDINGS.index(rounding), w, h, b, flags
                           | (_FLAG_CHROMA if chroma is not None else 0)),
             np.ascontiguousarray(luma, np.float32).tobytes()]
    if chroma is not None:
        parts.append(np.ascontiguousarray(chroma, np.float32).tobytes())
    parts.append(np.asarray([p.size for p in payloads],
                            np.uint64).tobytes())
    head = np.frombuffer(b"".join(parts), np.uint8)
    return np.concatenate([head] + payloads)


def _parse_video(blob):
    data = entropy.as_u8_stream(blob)
    if data.size < _FIXED_V.size:
        raise ContainerError("container too short")
    (magic, ver, mode_i, rounding_i, size_x, size_y, n_frames,
     flags) = _FIXED_V.unpack_from(data[:_FIXED_V.size].tobytes())
    if magic != MAGIC_V:
        raise ContainerError("bad container magic")
    if ver != VERSION:
        raise ContainerError(f"unsupported container version {ver}")
    if mode_i >= len(MODES) or rounding_i >= len(_ROUNDINGS):
        raise ContainerError("corrupt container header")
    if n_frames == 0 or n_frames > (1 << 24):
        raise ContainerError("corrupt container: implausible frame count")
    pos = _FIXED_V.size
    if data.size < pos + 256:
        raise ContainerError("container too short")
    luma = np.frombuffer(data[pos:pos + 256].tobytes(), np.float32).copy()
    pos += 256
    chroma = None
    if flags & _FLAG_CHROMA:
        if data.size < pos + 256:
            raise ContainerError("container too short")
        chroma = np.frombuffer(data[pos:pos + 256].tobytes(),
                               np.float32).copy()
        pos += 256
    if data.size < pos + 8 * n_frames:
        raise ContainerError("container too short")
    sizes = np.frombuffer(data[pos:pos + 8 * n_frames].tobytes(),
                          np.uint64)
    pos += 8 * n_frames
    # untrusted u64 sizes: bound each term BEFORE summing
    budget = data.size - pos
    offs = [pos]
    for s in sizes:
        if int(s) > budget:
            raise ContainerError("corrupt container: payload sizes "
                                 "exceed blob")
        budget -= int(s)
        offs.append(offs[-1] + int(s))
    if offs[-1] != data.size:
        raise ContainerError("corrupt container: payload size mismatch")
    meta = VideoMeta(mode=MODES[mode_i], size_x=size_x, size_y=size_y,
                     n_frames=n_frames, luma_lut=luma, chroma_lut=chroma,
                     rounding=_ROUNDINGS[rounding_i],
                     packed=bool(flags & _FLAG_PACKED),
                     stereo_planar=bool(flags & _FLAG_STEREO_PLANAR),
                     stereo_native=bool(flags & _FLAG_STEREO_NATIVE))
    if meta.stereo_planar and meta.stereo_native:
        raise ContainerError("corrupt container: both stereo layout bits")
    return data, offs, meta


def video_info(blob) -> VideoMeta:
    return _parse_video(blob)[2]


def _decode_records(rec, m, backend, compat):
    from . import api

    kw = dict(backend=backend, compat=compat)
    if m.mode == "enc-quant":
        return api.decode_quantize(rec, m.luma_lut, m.size_x, m.size_y,
                                   layout="scalar", **kw)
    if m.mode == "enc-quant-pair":
        return api.decode_quantize(rec, m.luma_lut, m.size_x, m.size_y,
                                   layout="pair", **kw)
    if m.mode == "enc-quant32":
        return api.decode_quantize32(rec, m.luma_lut, m.size_x, m.size_y,
                                     **kw)
    if m.mode == "enc-quant-stereo":
        planar = getattr(m, "stereo_planar", False)
        native = getattr(m, "stereo_native", False)
        if planar or native:
            s = m.size_y // 16
            bw = (api._stereo_native_bwp(m.size_x) if native
                  else m.size_x // 8)
            arr = rec           # np OR device array: reshape works on
            want = 2 * 64 * s * bw  # both without a host round-trip
            if arr.ndim == 1 and arr.size != want:
                raise ContainerError(
                    f"corrupt container: stereo payload size {arr.size} "
                    f"!= {want}")
            shape = (2, 64, s, bw) if arr.ndim == 1 else (-1, 2, 64, s, bw)
            return api.decode_quantize_stereo(
                arr.reshape(shape), m.luma_lut, m.size_x, m.size_y,
                view_layout="native" if native else "planar", **kw)
        return api.decode_quantize_stereo(rec, m.luma_lut, m.size_x,
                                          m.size_y, **kw)
    if m.mode == "enc-quant32-ycbcr420":
        return api.decode_quantize32_ycbcr420(rec, m.luma_lut, m.chroma_lut,
                                              m.size_x, m.size_y,
                                              backend=backend)
    return api.decode_quantize32_ycbcr(rec, m.luma_lut, m.chroma_lut,
                                       m.size_x, m.size_y, backend=backend)


def decode_video_frame(blob, index: int, *, backend: str | None = None,
                       compat: bool = False):
    """Random-access decode of one frame (per-frame payload table: only
    that frame's payload is unpacked and dispatched)."""
    from . import entropy

    data, offs, m = _parse_video(blob)
    if not 0 <= index < m.n_frames:
        raise ContainerError(f"frame index {index} out of range "
                             f"[0, {m.n_frames})")
    payload = data[offs[index]:offs[index + 1]]
    # .copy(): un-packed payloads must not alias the caller's blob
    if not m.packed:
        rec = payload.copy()
    elif backend == "numpy":
        rec = entropy.decompress(payload)
    else:
        rec = entropy.decompress_to_device(payload)
    return _decode_records(rec, m, backend, compat)


def decode_video(blob, *, backend: str | None = None,
                 compat: bool = False):
    """.sdtv container -> decoded u8 frame batch (one batched device
    dispatch after the host unpack)."""
    from . import entropy

    data, offs, m = _parse_video(blob)
    device = m.packed and backend != "numpy"
    recs = []
    for i in range(m.n_frames):
        payload = data[offs[i]:offs[i + 1]]
        if not m.packed:
            recs.append(payload)
        elif device:
            recs.append(entropy.decompress_to_device(payload))
        else:
            recs.append(entropy.decompress(payload))
    if device:
        import jax.numpy as jnp
        batch = jnp.stack(recs)    # device batch, one dispatch to decode
    else:
        batch = np.stack(recs)  # copies, so raw slices never escape
    return _decode_records(batch, m, backend, compat)


def _main(argv=None) -> int:
    """``python -m simd_dct_tpu.container {info,decode} file.sdt [out]``"""
    import argparse

    from .dispatch.capability import honor_cpu_platform_env
    honor_cpu_platform_env()

    p = argparse.ArgumentParser(prog="simd_dct_tpu.container")
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("info", help="print container metadata")
    pi.add_argument("file")
    pd = sub.add_parser("decode", help="decode a container to raw u8")
    pd.add_argument("file")
    pd.add_argument("out")
    args = p.parse_args(argv)

    blob = np.fromfile(args.file, np.uint8)
    is_video = blob.size >= 4 and blob[:4].tobytes() == MAGIC_V
    if args.cmd == "info":
        def _layout(m):
            if m.stereo_native:
                return " stereo_layout=native"
            if m.stereo_planar:
                return " stereo_layout=planar"
            return ""
        if is_video:
            m = video_info(blob)
            print(f"video mode={m.mode} size={m.size_x}x{m.size_y} "
                  f"frames={m.n_frames} rounding={m.rounding} "
                  f"packed={m.packed} "
                  f"chroma={'yes' if m.chroma_lut is not None else 'no'}"
                  + _layout(m))
        else:
            m = info(blob)
            print(f"mode={m.mode} size={m.size_x}x{m.size_y} "
                  f"rounding={m.rounding} strips=[{m.start_y},{m.end_y}) "
                  f"packed={m.packed} "
                  f"chroma={'yes' if m.chroma_lut is not None else 'no'}"
                  + _layout(m))
        return 0
    out = np.asarray(decode_video(blob) if is_video else decode(blob))
    out.tofile(args.out)
    print(f"decoded {out.shape} -> {args.out}")
    return 0


if __name__ == "__main__":   # pragma: no cover
    sys.exit(_main())
