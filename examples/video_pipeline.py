"""Batched video codec: one device dispatch for N frames, per-frame
random access, streaming overlap (runs anywhere; CPU ok).

    JAX_PLATFORMS=cpu python examples/video_pipeline.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from simd_dct_tpu.dispatch import honor_cpu_platform_env
honor_cpu_platform_env()  # a sitecustomize may pin a remote platform
import numpy as np

import simd_dct_tpu as sd
from simd_dct_tpu import container
from simd_dct_tpu.utils.feed import (stream_encode32_compressed,
                                     stream_decode32_compressed)

H, W = 128, 256
frames = np.stack([
    np.clip(128 + 60 * np.sin((np.mgrid[0:H, 0:W][1] + 3 * t) / 11),
            0, 255).astype(np.uint8)
    for t in range(8)])

# .sdtv container: frames encode in ONE batched dispatch; payloads are
# per-frame (random access) with a shared Huffman table.
clip = container.encode_video(frames, "enc-quant32", quality=50.0)
meta = container.video_info(clip)
print(f"clip: {meta.n_frames} frames {meta.size_x}x{meta.size_y}, "
      f"{clip.size} bytes ({frames[:, :H // 2].size / clip.size:.1f}x)")

frame5 = np.asarray(container.decode_video_frame(clip, 5))   # only payload 5
batch = np.asarray(container.decode_video(clip))             # one dispatch
assert np.array_equal(frame5, batch[5])
print("random-access frame == batch decode: ok")

# Streaming form: the device encodes frame k+1 while the host Huffman-
# packs frame k (bounded lookahead, constant memory).  sparse=True
# drops all-127 64-byte blocks ON DEVICE first (SDS1) so the host packs
# only significant content — the pack-bound fps cap scales by
# ~1/kept_fraction; the streams stay decodable by the same entry.
lut = sd.default_quant_lut(50) * 255.0
blobs = list(stream_encode32_compressed(iter(frames), lut, sparse=True))
print(f"streamed {len(blobs)} sparse-compressed frames, "
      f"{sum(b.size for b in blobs)} bytes total")

# Streaming inverse: host unpack of blob k+1 overlaps the device decode
# of blob k.
outs = list(stream_decode32_compressed(iter(blobs), lut, W, H))
assert all(o.shape == (H // 2, W) for o in outs)
print(f"streamed {len(outs)} decoded frames back: ok")
