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

# TPU-native stereo record layout (round 5): each shard's plane rows
# already sit at the 128-multiple minor dim, so per-shard stores and
# any later gather run at full DMA speed.
nat = jax.jit(lambda x: dist.encode_quantize_stereo_sharded(
    x, lut, mesh, view_layout="native"))(img)
ndec = jax.jit(lambda t: dist.decode_quantize_stereo_sharded(
    t, lut, W, H, mesh, view_layout="native"))(nat)
jax.block_until_ready(ndec)
print(f"stereo native sharded encode+decode ok: {nat.shape} -> "
      f"{np.asarray(ndec).shape}")
