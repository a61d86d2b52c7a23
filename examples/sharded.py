"""Multi-chip strip-sharded encode on a virtual 8-device CPU mesh —
the standard JAX way to exercise multi-chip code without a pod.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded.py

On a real TPU pod the same code shards over the physical mesh (blocks
never cross 16-row boundaries, so strip-dp needs zero collectives; the
stereo planar gather runs GSPMD / all_gather / ppermute-ring /
remote-DMA variants — see simd_dct_tpu/dist/).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from simd_dct_tpu.dispatch import honor_cpu_platform_env
honor_cpu_platform_env()  # a sitecustomize may pin a remote platform
import numpy as np
import jax

from simd_dct_tpu import dist
from simd_dct_tpu.core.quantize import default_quant_lut

mesh = dist.make_mesh(8)
print(f"mesh: {mesh.shape} on {mesh.devices.flat[0].platform}")

lut = default_quant_lut(100)
H, W = 16 * 8 * 8, 256        # 8 strips per shard
img = np.clip(128 + 60 * np.sin(np.mgrid[0:H, 0:W][1] / 9),
              0, 255).astype(np.uint8)

rec = jax.jit(lambda x: dist.encode_quantize32_sharded(
    x, lut * 255.0, mesh))(img)
dec = jax.jit(lambda r: dist.decode_quantize32_sharded(
    r, lut * 255.0, W, H, mesh))(rec)
jax.block_until_ready(dec)
print(f"sharded mode32 encode+decode ok: {np.asarray(dec).shape}")

seg = jax.jit(lambda x: dist.encode_quantize_stereo_sharded(
    x, lut, mesh, gather=True))(img)
print(f"stereo planar encode + all-gather ok: replicated="
      f"{seg.sharding.is_fully_replicated}")
