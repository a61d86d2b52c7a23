#!/usr/bin/env python
"""Headline benchmark: fused DCT+quant encode/decode throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the fraction of this chip's *measured* HBM copy roofline achieved by the
fused mode32 encode (the north-star criterion: >= 0.9 of roofline).
Bytes counted as in+out (1 u8 read + 1 u8 write per pixel), matching the
reference's bytes-processed accounting (src/main.cpp:72-78).

Runs on the default JAX platform (the real TPU under the driver).
"""

import json
import sys
import time

import numpy as np


def _pipeline_time(fn, args_cycle, runs):
    jax_block(fn(args_cycle[0]))
    t0 = time.perf_counter()
    rs = [fn(args_cycle[i % len(args_cycle)]) for i in range(runs)]
    jax_block(rs)
    return (time.perf_counter() - t0) / runs


def jax_block(x):
    import jax
    jax.block_until_ready(x)
    return x


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from simd_dct_tpu.kernels import xla_path as X
    from simd_dct_tpu.kernels import pallas_dct as PK
    from simd_dct_tpu.dispatch import probe
    from simd_dct_tpu.core.quantize import default_quant_lut

    H, W = 4096, 3840          # 4K-class frame, dual-view geometry
    runs = 40
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W), dtype=np.uint8)
    inputs = [jnp.asarray(base + np.uint8(i)) for i in range(4)]
    jax_block(inputs)
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    logical_bytes = (H // 2) * W * 2   # u8 in + u8 out

    # Measured copy roofline (same harness, same shapes).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    info = probe()

    def copy_roofline():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]
        f = jax.jit(lambda x: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((H // 2, W), jnp.uint8),
            grid_spec=pl.GridSpec(
                grid=(H // 2 // 256,),
                in_specs=[pl.BlockSpec((256, W), lambda p: (p, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((256, W), lambda p: (p, 0),
                                       memory_space=pltpu.VMEM)))(x))
        views = [x[: H // 2] for x in inputs]
        dt = _pipeline_time(f, views, runs)
        return logical_bytes / dt

    # Fused encode: pallas tier if the Mosaic service is up, else XLA panel.
    if info.supports_pallas and PK.supports(H, W):
        enc = jax.jit(lambda im: PK.encode_quantize32(im, lut))
        tier = "pallas"
    else:
        enc = jax.jit(lambda im: X.encode_quantize32(im, lut, 0, 1 << 30, "rne"))
        tier = "xla"

    try:
        roof = copy_roofline()
    except Exception:
        roof = 819e9  # v5e HBM spec fallback when pallas cannot compile

    dt = _pipeline_time(enc, inputs, runs)
    gbps = logical_bytes / dt / 1e9

    print(json.dumps({
        "metric": f"enc_quant32_fused_{tier}_4k",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / (roof / 1e9), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
