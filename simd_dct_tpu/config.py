"""Encoder configuration (SURVEY.md §5 "config/flag system" row).

The reference's configuration state is a CLI bitmask plus mutable global
feature bools (src/main.cpp:194-282, simd_platform.c:30-55).  Here the
same knobs are a frozen dataclass, with an ``Encoder`` convenience
wrapper binding a config + LUT to the api entry points.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .core.quantize import ROUNDING_MODES, default_quant_lut
from .dispatch.capability import TIERS


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """All encode-path knobs in one place.

    quality: LUT scale factor; None = unscaled base table (the reference
        applies its declared default 50 only when --quality is passed).
    rounding: 'rne' (SSE4.1/AVX compat, default) / 'scalar' / 'clamp_first'.
    layout: enc-quant byte layout, 'scalar' or 'pair'.
    stereo_layout: enc-quant-stereo record layout — 'interleaved'
        (reference byte stream, default), 'planar' (separate views) or
        'native' (128-multiple padded plane rows, the TPU fast-DMA
        format).
    backend: explicit tier or None for the capability cascade.
    start_y/end_y: reference strip-range contract.
    compat: strict-IEEE butterfly engine — encode output byte-identical
        to the C++ oracle on every tier (slow; conformance mode).
    """
    quality: float | None = None
    rounding: str = "rne"
    layout: str = "scalar"
    backend: str | None = None
    start_y: int = 0
    end_y: int | None = None
    compat: bool = False
    stereo_layout: str = "interleaved"

    def __post_init__(self):
        if self.rounding not in ROUNDING_MODES:
            raise ValueError(f"rounding must be one of {ROUNDING_MODES}")
        if self.layout not in ("scalar", "pair", "pair_as_written"):
            raise ValueError(
                "layout must be 'scalar', 'pair' or 'pair_as_written'")
        if self.stereo_layout not in ("interleaved", "planar", "native"):
            raise ValueError("stereo_layout must be 'interleaved', "
                             "'planar' or 'native'")
        if self.backend is not None and self.backend not in TIERS:
            raise ValueError(f"backend must be one of {TIERS} or None")

    def lut(self) -> np.ndarray:
        return default_quant_lut(self.quality)


class Encoder:
    """Config-bound facade over the api entry points.

    >>> enc = Encoder(EncoderConfig(quality=50))
    >>> records = enc.encode_quantize32(image)
    >>> image2 = enc.decode_quantize32(records, w, h)
    """

    def __init__(self, config: EncoderConfig | None = None):
        self.config = config or EncoderConfig()
        self._lut = self.config.lut()

    @property
    def lut(self) -> np.ndarray:
        return self._lut

    def _kw(self):
        c = self.config
        return dict(backend=c.backend)

    def encode_quantize(self, image):
        from . import api
        c = self.config
        return api.encode_quantize(image, self._lut, c.start_y, c.end_y,
                                   rounding=c.rounding, layout=c.layout,
                                   compat=c.compat, **self._kw())

    def encode_quantize32(self, image):
        from . import api
        c = self.config
        # mode32 quantizes raw 0..255 coefficients (src/simd_dct.cpp:2036):
        # the LUT is conventionally 255x the normalized-domain table.
        return api.encode_quantize32(image, self._lut * np.float32(255.0),
                                     c.start_y, c.end_y,
                                     rounding=c.rounding, compat=c.compat,
                                     **self._kw())

    def encode_quantize_stereo(self, image):
        from . import api
        c = self.config
        return api.encode_quantize_stereo(image, self._lut, c.start_y,
                                          c.end_y, rounding=c.rounding,
                                          compat=c.compat,
                                          view_layout=c.stereo_layout,
                                          **self._kw())

    def decode_quantize(self, data, size_x: int, size_y: int):
        from . import api
        return api.decode_quantize(data, self._lut, size_x, size_y,
                                   layout=self.config.layout,
                                   compat=self.config.compat, **self._kw())

    def decode_quantize32(self, data, size_x: int, size_y: int):
        from . import api
        return api.decode_quantize32(data, self._lut * np.float32(255.0),
                                     size_x, size_y,
                                     compat=self.config.compat, **self._kw())

    def decode_quantize_stereo(self, data, size_x: int, size_y: int):
        from . import api
        return api.decode_quantize_stereo(data, self._lut, size_x, size_y,
                                          compat=self.config.compat,
                                          view_layout=self.config
                                          .stereo_layout, **self._kw())

    def roundtrip_quantize32(self, image):
        from . import api
        return api.roundtrip_quantize32(image,
                                        self._lut * np.float32(255.0),
                                        **self._kw())

    # -- YCbCr color pipeline (north-star extension) -------------------

    def chroma_lut(self) -> np.ndarray:
        from .layout.color import BASE_CHROMA_QUANT_TABLE
        q = self.config.quality
        return (BASE_CHROMA_QUANT_TABLE * (1.0 if q is None else q)) \
            .astype(np.float32)

    def encode_quantize32_ycbcr(self, planes):
        from . import api
        c = self.config
        return api.encode_quantize32_ycbcr(
            planes, self._lut * np.float32(255.0),
            self.chroma_lut() * np.float32(255.0),
            rounding=c.rounding, **self._kw())

    def decode_quantize32_ycbcr(self, data, size_x: int, size_y: int):
        from . import api
        return api.decode_quantize32_ycbcr(
            data, self._lut * np.float32(255.0),
            self.chroma_lut() * np.float32(255.0), size_x, size_y,
            **self._kw())

    def roundtrip_quantize32_ycbcr(self, planes):
        from . import api
        return api.roundtrip_quantize32_ycbcr(
            planes, self._lut * np.float32(255.0),
            self.chroma_lut() * np.float32(255.0), **self._kw())

    def encode_quantize32_ycbcr420(self, planes):
        from . import api
        c = self.config
        return api.encode_quantize32_ycbcr420(
            planes, self._lut * np.float32(255.0),
            self.chroma_lut() * np.float32(255.0),
            rounding=c.rounding, **self._kw())

    def decode_quantize32_ycbcr420(self, data, size_x: int, size_y: int):
        from . import api
        return api.decode_quantize32_ycbcr420(
            data, self._lut * np.float32(255.0),
            self.chroma_lut() * np.float32(255.0), size_x, size_y,
            **self._kw())

    # -- entropy-coded bitstream (north-star extension) -----------------

    def encode_quantize32_compressed(self, image, rle: bool = False,
                                     sparse: bool = False) -> np.ndarray:
        """Fused mode32 encode + on-device histogram + native 4-stream
        Huffman pack -> self-contained compressed stream (``rle=True``:
        run-length + Huffman, better ratio on typical records;
        ``sparse=True``: device-side significance compaction first — the
        host packs only significant 64-byte blocks, lifting the
        pack-bound fps cap ~1/kept_fraction on typical content; dense
        inputs route through the SDN1 nibble-split fast path — ~3x the
        pack fps at a ~20% ratio cost vs the plain pack, which remains
        available via ``entropy.compress_sparse(dense_fast=False)`` —
        and every stream decodes via the same ``decompress``)."""
        from . import entropy
        rec = self.encode_quantize32(image)
        if sparse:
            return entropy.compress_sparse(rec, rle=rle)
        return entropy.compress_records(rec, rle=rle)

    def decode_quantize32_compressed(self, blob, size_x: int, size_y: int):
        """Inverse: native Huffman unpack + fused mode32 decode."""
        from . import entropy
        return self.decode_quantize32(entropy.decompress(blob),
                                      size_x, size_y)

    # -- self-describing containers (north-star extension) ---------------

    def encode_container(self, image, mode: str = "enc-quant32", *,
                         compress: bool = True, rle: bool = False,
                         sparse: bool = False):
        """Image -> .sdt container under this config (mode + geometry +
        the exact LUTs travel in the header; see simd_dct_tpu.container)."""
        from . import container
        c = self.config
        return container.encode(image, mode, quality=c.quality,
                                rounding=c.rounding, compress=compress,
                                rle=rle, sparse=sparse,
                                start_y=c.start_y, end_y=c.end_y,
                                backend=c.backend,
                                view_layout=(c.stereo_layout
                                             if mode == "enc-quant-stereo"
                                             else "interleaved"))

    def decode_container(self, blob):
        """.sdt container -> decoded image (self-describing: the header's
        mode/LUTs are used, not this config's)."""
        from . import container
        return container.decode(blob, backend=self.config.backend,
                                compat=self.config.compat)

    def encode_video_container(self, frames, mode: str = "enc-quant32", *,
                               compress: bool = True, rle: bool = False,
                               sparse: bool = False):
        """Frame batch -> .sdtv container (one batched device dispatch,
        per-frame payloads, shared Huffman table; ``sparse``: per-frame
        SDS1 device precompaction)."""
        from . import container
        c = self.config
        return container.encode_video(frames, mode, quality=c.quality,
                                      rounding=c.rounding,
                                      compress=compress, rle=rle,
                                      sparse=sparse,
                                      backend=c.backend,
                                      view_layout=(c.stereo_layout
                                                   if mode
                                                   == "enc-quant-stereo"
                                                   else "interleaved"))

    def decode_video_container(self, blob):
        from . import container
        return container.decode_video(blob, backend=self.config.backend,
                                      compat=self.config.compat)
