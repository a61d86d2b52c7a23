#!/usr/bin/env python
"""Headline benchmark: fused mode32 DCT+quant encode throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (hard-won on the tunnel platform): per-invocation dispatch
overhead through the remote-TPU relay is ~1 ms, so throughput is measured
as the SLOPE between two single-dispatch batched (vmapped) runs of
different batch sizes — overhead and constant costs cancel.  A checksum
consumes every output byte so nothing can be elided (pallas calls are
opaque to XLA, so a linear checksum is safe here).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the fraction of the same-harness measured u8 HBM copy roofline achieved
by the fused encode (north star: >= 0.9).  Bytes counted as logical
in+out (1 u8 read + 1 u8 write per pixel), matching the reference's
accounting (src/main.cpp:72-78).
"""

import json
import sys
import time

import numpy as np


def _slope_ms(make_fn, batches, reps=8):
    """Per-frame seconds via the slope of single-dispatch batched runs.

    The wall ends when the checksum SCALAR is on the host (``float(...)``)
    — block_until_ready alone is not a reliable completion barrier through
    the remote-TPU relay, and bulk D2H runs at ~3 MB/s, so only a
    scalar-fetch wall is trustworthy."""
    walls = {}
    for bsz, xb in batches:
        f = make_fn()
        float(f(xb))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(xb))
            best = min(best, time.perf_counter() - t0)
        walls[bsz] = best
    (b0, _), (b1, _) = batches
    return (walls[b1] - walls[b0]) / (b1 - b0)


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from simd_dct_tpu.kernels import pallas_dct as PK
    from simd_dct_tpu.kernels import xla_path as X
    from simd_dct_tpu.dispatch import probe
    from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales

    H2, W = 2048, 3840           # 4K-class view (H = 4096 dual-view)
    rng = np.random.default_rng(0)
    lut = jnp.asarray(default_quant_lut(100) * 255.0)
    logical_bytes = H2 * W * 2

    def batches(sizes):
        out = []
        for bsz in sizes:
            out.append((bsz, jnp.asarray(
                rng.integers(0, 256, (bsz, H2, W), dtype=np.uint8))))
        jax.block_until_ready([b for _, b in out])
        return out

    # the constant per-dispatch cost (~25 ms through the tunnel) cancels
    # in the slope
    bs_enc = batches((8, 72))
    info = probe()

    def checksum(one):
        return lambda: jax.jit(
            lambda xs: jnp.sum(jax.vmap(one)(xs).astype(jnp.int32)))

    use_pallas = info.supports_pallas
    if use_pallas:
        scales = quant_scales(lut)

        # The roofline probe is a pure-XLA u8 elementwise pass (1 read +
        # 1 write per byte), measured with TWO dispatches so the jit
        # boundary forces the output array to materialize (a single fused
        # program would elide the write and time a read-only reduction).
        # Measured well above any hand-rolled pallas copy kernel variant
        # (209 GB/s at best) — the honest achievable ceiling here.
        def copy_checksum():
            f1 = jax.jit(lambda xs: xs + jnp.uint8(1))
            f2 = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))
            return lambda xb: f2(f1(xb))

        def one_enc(v):
            return PK._enc32_panels(v, scales, normalize=False,
                                    rounding="rne", precision="bf16")
        try:
            # median of repeated slope estimates: single slopes vary
            # +-20% (occasionally negative) from tunnel jitter
            def robust_slope(mk, tries=7):
                import statistics
                vals = [v for v in (_slope_ms(mk, bs_enc)
                                    for _ in range(tries)) if v > 0]
                if not vals:
                    raise RuntimeError("no positive slope measurement")
                return statistics.median(vals)

            copy_s = robust_slope(copy_checksum)
            enc_s = robust_slope(checksum(one_enc))
            tier = "pallas_bf16"
        except Exception:
            use_pallas = False
    if not use_pallas:
        def one_enc(v):
            return X.encode32_view(v, lut, "rne")
        # XLA output feeds a square-checksum so layout work can't be elided
        def mk():
            return jax.jit(lambda xs: jnp.sum(jnp.square(
                jax.vmap(one_enc)(xs).astype(jnp.float32))))
        enc_s = _slope_ms(mk, bs_enc)
        tier = "xla"

    from simd_dct_tpu.utils.profiling import hbm_peak_gbps
    gbps = logical_bytes / enc_s / 1e9
    copy_gbps = None
    if use_pallas and copy_s > 0:
        # measured same-harness u8 copy roofline (the honest ceiling)
        copy_gbps = round(logical_bytes / copy_s / 1e9, 2)
        roof_gbps = copy_gbps
    else:
        roof_gbps = hbm_peak_gbps(info.device_kind) or 819.0
    # An encode "faster than copy" is a measurement failure, not a win:
    # flag it and clamp the headline fraction at 1.0 (round-1 VERDICT #5).
    raw_fraction = gbps / roof_gbps
    record = {
        "metric": f"enc_quant32_fused_{tier}_4k",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(min(raw_fraction, 1.0), 4),
        "copy_gbps": copy_gbps,
        "raw_fraction": round(raw_fraction, 4),
    }
    if raw_fraction > 1.02:
        record["measurement_flag"] = "encode_exceeds_copy_roofline"
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
