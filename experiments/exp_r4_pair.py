"""Round-3 perf experiments: closing the pair-encode gap.

BENCH_r02: enc_pair 75.8 us / 4K = 0.35x copy roofline, vs enc32 29.3 us
(0.89x) on the SAME algebra (2 matmuls + constant output permutation).
Hypothesis: the pair kernel's output block is (16, 8W) — only 16
sublanes, below the (32, 128) u8 min tile — so every one of its ~4096
(16,128) stores is a masked sub-tile store (and pads to 32 sublanes in
HBM traffic terms).  enc32 dodges exactly this with halves=2: two
128-row panels per grid step so paired 16-sublane pieces make one
aligned 32-sublane store (pallas_dct.py:83-87).

Variants measured here (all byte-checked against the shipping kernel):
  floor : _tiles_panels — same matmuls + aligned natural-layout stores
          (no byte-record epilogue): the pipeline's compute+store floor
  v0    : shipping _encq_pair_panels (halves=1, masked stores)
  v1    : halves=2 — pair the two panels' (16,128) pieces into aligned
          (32,128) stores (the enc32 trick applied to the pair epilogue)
  v2    : halves=2 + (32,256) stores (both cells of a cell-pair at once)

Run: python experiments/exp_r4_pair.py [check|measure]
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

from experiments.exp_r2_layout import slope, report, H2, W  # noqa: E402
from simd_dct_tpu.core.quantize import default_quant_lut, quant_scales
from simd_dct_tpu.kernels import pallas_dct as PK

PANEL, CHUNK = PK.PANEL, PK.CHUNK


def _pair_kernel_h2(x_ref, b_ref, a_ref, q_ref, out_ref, *, rounding,
                    groups, dtype, halves, wide_stores):
    bmat = b_ref[...]
    amat = a_ref[...]
    q_big = q_ref[...]

    def compute_words(h, c):
        x = (x_ref[pl.ds(h * PANEL, PANEL), pl.ds(c * CHUNK, CHUNK)]
             .astype(jnp.int32).astype(jnp.float32)
             * jnp.float32(1.0 / 255.0)).astype(dtype)
        y = jnp.dot(x, amat, preferred_element_type=jnp.float32) \
            .astype(dtype)
        z = jnp.dot(bmat, y, preferred_element_type=jnp.float32)
        zq = PK._quantize_tile(z * q_big, rounding)
        return pltpu.bitcast(zq, jnp.int32)              # (32, 128)

    for base, store_from in groups:
        u8ts = []
        for h in range(halves):
            pp = jnp.concatenate(
                [compute_words(h, base + i) for i in range(4)], axis=0)
            u8ts.append(pltpu.bitcast(pp.T, jnp.uint8))  # (512, 128)
        for cp in range(4):
            vts = [u8t[cp * 128:(cp + 1) * 128, :].T for u8t in u8ts]
            for cl in range(store_from, 4):
                c = base + cl
                if wide_stores:
                    piece = jnp.concatenate(
                        [jnp.concatenate(
                            [vt[cl * 32: cl * 32 + 16, :],
                             vt[cl * 32 + 16: cl * 32 + 32, :]], axis=1)
                         for vt in vts], axis=0)          # (16h, 256)
                    # lanes: cellbit*64+rest from each 16-row band ->
                    # record order [cell*128 + half*64 + rest] needs the
                    # two cellbits' halves interleaved, which concat
                    # along axis=1 of (lo|hi) does NOT give -- wide
                    # stores need a lane shuffle; only valid for cell-
                    # bit-major probing.  See check() for what v2 means.
                    out_ref[:, pl.ds(c * 1024 + cp * 256, 256)] = piece
                else:
                    for cellbit in range(2):
                        cell = 2 * cp + cellbit
                        parts = [jnp.concatenate(
                            [vt[cl * 32: cl * 32 + 16,
                                cellbit * 64: cellbit * 64 + 64],
                             vt[cl * 32 + 16: cl * 32 + 32,
                                cellbit * 64: cellbit * 64 + 64]], axis=1)
                            for vt in vts]
                        piece = (parts[0] if halves == 1
                                 else jnp.concatenate(parts, axis=0))
                        out_ref[:, pl.ds(c * 1024 + cell * 128, 128)] = piece


@functools.partial(jax.jit, static_argnames=("rounding", "halves",
                                             "wide_stores"))
def encode_pair_h2(view, scales, *, rounding="rne", halves=2,
                   wide_stores=False):
    h2, w = view.shape
    num_steps = -(-h2 // (PANEL * halves))
    dtype = jnp.bfloat16
    kernel = functools.partial(
        _pair_kernel_h2, rounding=rounding,
        groups=PK._pair_groups(w // CHUNK), dtype=dtype, halves=halves,
        wide_stores=wide_stores)
    grid_spec = pl.GridSpec(
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((PANEL * halves, w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((128, 128), lambda p: (0, 0),
                         memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((16 * halves, 8 * w), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h2 // 8, 8 * w), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 128 * 128 * w * halves * num_steps,
            bytes_accessed=2 * h2 * w, transcendentals=0),
    )(view, jnp.asarray(PK._pair_row_basis_np()).astype(dtype),
      jnp.asarray(PK._pair_col_basis_np()).astype(dtype),
      PK._pair_q_tile(scales))


def check():
    lut = jnp.asarray(default_quant_lut(50))
    scales = quant_scales(lut)
    rng = np.random.default_rng(0xC0FFEE)
    view = jnp.asarray(rng.integers(0, 256, (512, 512), dtype=np.uint8))
    want = np.asarray(PK._encq_pair_panels(view, scales, rounding="rne"))
    got = np.asarray(encode_pair_h2(view, scales))
    nbad = int(np.count_nonzero(got != want))
    print(f"v1 halves=2 vs shipping: n_bad={nbad}/{want.size}", flush=True)
    assert nbad == 0


def measure():
    lut = jnp.asarray(default_quant_lut(50))
    scales = quant_scales(lut)

    def mk(one):
        return lambda: jax.jit(lambda xs: jnp.sum(
            jax.vmap(one)(xs).astype(jnp.int32)))

    report("floor  _tiles_panels (aligned natural stores)", slope(mk(
        lambda v: PK._tiles_panels(v, scales, normalize=True,
                                   rounding="rne", orientation="fx")
        .reshape(H2 // 8, 8 * W))))
    report("v0     shipping pair (halves=1)", slope(mk(
        lambda v: PK._encq_pair_panels(v, scales, rounding="rne"))))
    report("v1     halves=2 aligned (32,128) stores", slope(mk(
        lambda v: encode_pair_h2(v, scales))))
    report("v2     halves=2 wide (32,256) stores [layout-wrong probe]",
           slope(mk(lambda v: encode_pair_h2(v, scales, wide_stores=True))))


if __name__ == "__main__":
    what = sys.argv[1:] or ["check", "measure"]
    if "check" in what:
        check()
    if "measure" in what:
        measure()
