"""simd_dct_tpu — a TPU-native 8x8 block DCT/quantize/reorder engine.

Brand-new JAX/XLA/Pallas framework with the full capability surface of the
CPU SIMD reference ``rainerzufalldererste/simd_dct`` (see SURVEY.md), plus
the north-star decode path, RGB/zigzag layout transforms, and multi-host
sharding.  Layer map (SURVEY.md §7):

* ``core``     — DCT basis / quantization math + scalar NumPy golden model
* ``layout``   — blockize, the three reference output layouts, zigzag, RGB
* ``kernels``  — fused Pallas TPU fast path + pure-XLA fallback
* ``dispatch`` — backend capability probe & tiering (≙ CPUID/--max-simd)
* ``api``      — validated public entry points (≙ simd_dct.h)
* ``dist``     — mesh sharding / multi-host scaling
* ``bench``    — statistics-grade benchmark harness (≙ main.cpp harness)
* ``entropy``  — Huffman bitstream stage (beyond the reference): on-device
  histogram + native C++ canonical coder (native/entropy.cpp)
* ``container`` — self-describing .sdt frame container (mode, geometry,
  LUTs, entropy payload) so streams decode without out-of-band metadata
"""

__version__ = "0.1.0"

from . import core
from . import layout
from . import dispatch
from . import api
from . import entropy
from . import container
from .api import (
    SimdDctResult, SimdDctError, InvalidParameterError, NotSupportedError,
    encode_quantize, encode_quantize32, encode_quantize_stereo,
    decode_quantize, decode_quantize32, decode_quantize_stereo,
    roundtrip_quantize32,
)
from .core.quantize import default_quant_lut
from .config import EncoderConfig, Encoder

__all__ = [
    "core", "layout", "dispatch", "api", "entropy", "container",
    "__version__",
    "SimdDctResult", "SimdDctError", "InvalidParameterError",
    "NotSupportedError",
    "encode_quantize", "encode_quantize32", "encode_quantize_stereo",
    "decode_quantize", "decode_quantize32", "decode_quantize_stereo",
    "roundtrip_quantize32", "default_quant_lut",
    "EncoderConfig", "Encoder",
]
