"""Minimal encode -> decode walkthrough (runs anywhere; CPU ok).

    JAX_PLATFORMS=cpu python examples/encode_decode.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from simd_dct_tpu.dispatch import honor_cpu_platform_env
honor_cpu_platform_env()  # a sitecustomize may pin a remote platform
import numpy as np

import simd_dct_tpu as sd
from simd_dct_tpu.utils.metrics import psnr

# A smooth 512x512 test image (dual-view geometry: the top H/2 rows are
# the view the non-stereo modes encode — reference convention).
H, W = 512, 512
yy, xx = np.mgrid[0:H, 0:W]
img = np.clip(128 + 60 * np.sin(xx / 17) * np.cos(yy / 13),
              0, 255).astype(np.uint8)

# Functional api: mode32 (the flagship coefficient-major layout) uses a
# raw-domain LUT (255x the normalized table — reference quirk).
lut = sd.default_quant_lut(quality=100)
records = np.asarray(sd.encode_quantize32(img, lut * 255.0))
decoded = np.asarray(sd.decode_quantize32(records, lut * 255.0, W, H))
print(f"mode32: {records.size} record bytes, "
      f"PSNR {psnr(decoded, img[:H // 2]):.2f} dB")

# Config-bound facade (handles per-mode LUT conventions), plus the
# entropy-coded pipeline and the self-describing .sdt container.
enc = sd.Encoder(sd.EncoderConfig(quality=100))
blob = enc.encode_container(img, "enc-quant32", rle=True)
print(f"container: {blob.size} bytes "
      f"({img[:H // 2].size / blob.size:.1f}x vs raw records)")
roundtrip = np.asarray(enc.decode_container(blob))
assert np.array_equal(roundtrip, decoded)
print("container decode == direct decode: ok")

# Stereo mode with the TPU-native record layout (round 5): plane rows
# padded to a 128-multiple minor dim — the format the u8 DMA rule
# demands (docs/LESSONS.md); decode reads it at ~0.75x copy on chip.
nat = sd.api.encode_quantize_stereo(img, lut, view_layout="native")
print(f"stereo native tensor: {nat.shape} "
      f"(pad columns >= {W // 8} hold 127)")
both = np.asarray(sd.api.decode_quantize_stereo(
    nat, lut, W, H, view_layout="native"))
print(f"stereo native round-trip: PSNR {psnr(both, img):.2f} dB")
