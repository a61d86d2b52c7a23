"""Round-5 probe: the TPU-native stereo record format vs the shipping
planar/interleaved layouts on the real chip.

The round-4 analysis (docs/STATUS.md "u8 DMA minor-dim lesson",
exp_r12/r13) proved the stereo walls are a *format* property: the
reference-geometry 480-byte plane rows DMA at ~1/3 speed.  The native
format (view_layout='native') pads plane rows to 512 bytes in-kernel —
this probe measures whether that converts the proven DMA headroom into
wall-clock (target: >= 0.7x copy both directions, what the 4:2:0
streams already reach).

Methodology: rep-paired slopes vs the same-run u8 copy probe (the
bench.py estimator), 5 cycles x 8 reps, batch sizes (8, 136).
"""

import statistics
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from simd_dct_tpu.core.quantize import (default_quant_lut,
                                            dequant_scales, quant_scales)
    from simd_dct_tpu.kernels import pallas_dct as PK

    H2, W = 2048, 3840
    bw = W // 8
    bwp = -(-bw // 128) * 128
    logical = H2 * W * 2
    lut = default_quant_lut(100)
    scales, inv = quant_scales(lut), dequant_scales(lut)

    def dev(shape, sizes=(8, 136)):
        out = []
        for b in sizes:
            key = jax.random.PRNGKey(b)
            out.append((b, jax.random.randint(
                key, (b,) + shape, 0, 256, dtype=jnp.int32)
                .astype(jnp.uint8)))
        jax.block_until_ready([x for _, x in out])
        return out

    def csum(one):
        return jax.jit(lambda xs: jnp.sum(
            jax.vmap(one)(xs).astype(jnp.int32)))

    cp = None

    def paired(f, batches, bs_copy, cycles=5, reps=8):
        for _, xb in batches:
            float(f(xb))
        for _, xb in bs_copy:
            float(cp(xb))
        m_cyc, c_cyc = [], []
        for _ in range(cycles):
            best = {}
            for _ in range(reps):
                for tag, g, bs in (("m", f, batches), ("c", cp, bs_copy)):
                    for bsz, xb in bs:
                        t0 = time.perf_counter()
                        float(g(xb))
                        best[(tag, bsz)] = min(
                            best.get((tag, bsz), 1e9),
                            time.perf_counter() - t0)
            (mb0, _), (mb1, _) = batches
            (cb0, _), (cb1, _) = bs_copy
            m_cyc.append(1e6 * (best[("m", mb1)] - best[("m", mb0)])
                         / (mb1 - mb0))
            c_cyc.append(1e6 * (best[("c", cb1)] - best[("c", cb0)])
                         / (cb1 - cb0))
        return m_cyc, c_cyc

    f1 = jax.jit(lambda xs: xs + jnp.uint8(1))
    f2 = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))
    cp = lambda xb: f2(f1(xb))  # noqa: E731

    bs_copy = dev((H2, W), sizes=(8, 136))
    rows = {}

    bs_img = dev((2 * H2, W))
    for name, layout in (("enc_native", "native"), ("enc_planar", "planar"),
                         ("enc_ilv", "interleaved")):
        f = csum(lambda v, _l=layout: PK._enc_stereo_panels(
            v, scales, rounding="rne", view_layout=_l))
        m, c = paired(f, bs_img, bs_copy)
        us = statistics.median(m)
        frac = statistics.median([2 * cc / mm for mm, cc in zip(m, c)
                                  if mm > 0 and cc > 0])
        rows[name] = (us, frac, m, c)
        print(f"{name:12s} {us:7.1f} us  frac_of_copy {frac:.3f}  "
              f"cycles {[round(v, 1) for v in m]}", flush=True)
    del bs_img

    bs_nat = dev((2, 64, H2 // 8, bwp))
    f = csum(lambda p: PK._dec_stereo_panels(p, inv, true_bw=bw))
    m, c = paired(f, bs_nat, bs_copy)
    us = statistics.median(m)
    frac = statistics.median([2 * cc / mm for mm, cc in zip(m, c)
                              if mm > 0 and cc > 0])
    rows["dec_native"] = (us, frac, m, c)
    print(f"{'dec_native':12s} {us:7.1f} us  frac_of_copy {frac:.3f}  "
          f"cycles {[round(v, 1) for v in m]}", flush=True)
    del bs_nat

    bs_pla = dev((2, 64, H2 // 8, bw))
    f = csum(lambda p: PK._dec_stereo_panels(p, inv))
    m, c = paired(f, bs_pla, bs_copy)
    us = statistics.median(m)
    frac = statistics.median([2 * cc / mm for mm, cc in zip(m, c)
                              if mm > 0 and cc > 0])
    rows["dec_planar"] = (us, frac, m, c)
    print(f"{'dec_planar':12s} {us:7.1f} us  frac_of_copy {frac:.3f}  "
          f"cycles {[round(v, 1) for v in m]}", flush=True)

    print("\nsummary (us, frac):",
          {k: (round(v[0], 1), round(v[1], 3)) for k, v in rows.items()})


if __name__ == "__main__":
    main()
