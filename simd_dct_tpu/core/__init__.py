"""Core transform math: DCT basis, quantization, scalar golden model."""

from .dct import (
    dct_basis,
    dct_basis_np,
    strip_basis,
    strip_basis_np,
    dct8,
    idct8,
    dct8x8,
    idct8x8,
)
from .quantize import (
    VR,
    BIAS,
    ROUNDING_MODES,
    BASE_QUANT_TABLE,
    default_quant_lut,
    quant_scales,
    dequant_scales,
    quantize_to_u8,
    dequantize_from_u8,
)
from . import golden

__all__ = [
    "dct_basis", "dct_basis_np", "strip_basis", "strip_basis_np",
    "dct8", "idct8", "dct8x8", "idct8x8",
    "VR", "BIAS", "ROUNDING_MODES", "BASE_QUANT_TABLE",
    "default_quant_lut", "quant_scales", "dequant_scales",
    "quantize_to_u8", "dequantize_from_u8", "golden",
]
