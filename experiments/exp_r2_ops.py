"""Probe which Mosaic lane/byte ops lower, and their cost.

Each probe is a tiny kernel on (256, 1024) data; success = compiles+runs.
Run: python experiments/exp_r2_ops.py [probe...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

R, C = 256, 1024


def run_kernel(body, out_shape, x_dtype=jnp.int32):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 200, (R, C)),
                    x_dtype)

    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, x_dtype
                                       if out_shape[0] == R else x_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.block_until_ready(f(x))
    return np.asarray(out), np.asarray(x)


def check(name, fn):
    t0 = time.time()
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'WRONG'} ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def probe_roll():
    out, x = run_kernel(lambda v: jnp.roll(v, -1, axis=1), (R, C))
    return np.array_equal(out, np.roll(x, -1, axis=1))


def probe_repeat2():
    out, x = run_kernel(lambda v: jnp.repeat(v[:, :C // 2], 2, axis=1), (R, C))
    return np.array_equal(out, np.repeat(x[:, :C // 2], 2, axis=1))


def probe_iota_select():
    def body(v):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        return jnp.where(lane % 2 == 0, v, v + 1)
    out, x = run_kernel(body, (R, C))
    want = np.where(np.arange(C)[None, :] % 2 == 0, x, x + 1)
    return np.array_equal(out, want)


def probe_strided_read():
    out, x = run_kernel(lambda v: jnp.concatenate(
        [v[:, 0::4], v[:, 1::4], v[:, 2::4], v[:, 3::4]], axis=1), (R, C))
    want = np.concatenate([x[:, 0::4], x[:, 1::4], x[:, 2::4], x[:, 3::4]],
                          axis=1)
    return np.array_equal(out, want)


def probe_interleave2():
    """zip two lane-halves: C[2l]=A[l], C[2l+1]=B[l] via repeat+select."""
    def body(v):
        a, b = v[:, :C // 2], v[:, C // 2:]
        ra = jnp.repeat(a, 2, axis=1)
        rb = jnp.repeat(b, 2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        return jnp.where(lane % 2 == 0, ra, rb)
    out, x = run_kernel(body, (R, C))
    a, b = x[:, :C // 2], x[:, C // 2:]
    want = np.empty_like(x)
    want[:, 0::2] = a
    want[:, 1::2] = b
    return np.array_equal(out, want)


def probe_bitcast_lane():
    """pltpu.bitcast i32 -> u8: what shape/semantics?"""
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, (64, 128)),
                    jnp.int32)

    def kernel(x_ref, o_ref):
        b = pltpu.bitcast(x_ref[...], jnp.uint8)
        pl.debug_print("bitcast shape {}", b.shape[0])
        o_ref[...] = b

    for shape in [(256, 128), (64, 512), (64, 128, 4)]:
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.uint8),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = np.asarray(jax.block_until_ready(f(x)))
            xb = np.asarray(x)
            print(f"  bitcast out_shape {shape}: compiled", flush=True)
            # check semantics vs lane-major little-endian reinterpret
            want_lane = xb.view(np.uint8).reshape(64, 512)
            if shape == (64, 512) and np.array_equal(out, want_lane):
                print("  -> lane-major little-endian ✓", flush=True)
            elif shape == (256, 128):
                # sublane-expansion: u8[4i+k, l] = byte k of x[i, l]?
                want_sub = xb.view(np.uint8).reshape(64, 128, 4) \
                    .transpose(0, 2, 1).reshape(256, 128)
                print("  -> sublane-major match:",
                      np.array_equal(out, want_sub), flush=True)
                # interleaved variant: u8[k*64+i, l]?
                want_plane = xb.view(np.uint8).reshape(64, 128, 4) \
                    .transpose(2, 0, 1).reshape(256, 128)
                print("  -> byte-plane match:",
                      np.array_equal(out, want_plane), flush=True)
            return True
        except Exception as e:
            print(f"  bitcast out_shape {shape}: {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)
    return False


def probe_strided_store():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 200, (R, C // 2)),
                    jnp.int32)

    def kernel(x_ref, o_ref):
        o_ref[:, 0::2] = x_ref[...]
        o_ref[:, 1::2] = x_ref[...] + 1

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(jax.block_until_ready(f(x)))
    xb = np.asarray(x)
    return (np.array_equal(out[:, 0::2], xb)
            and np.array_equal(out[:, 1::2], xb + 1))


PROBES = {
    "roll": probe_roll,
    "repeat2": probe_repeat2,
    "iota_select": probe_iota_select,
    "strided_read": probe_strided_read,
    "interleave2": probe_interleave2,
    "bitcast_lane": probe_bitcast_lane,
    "strided_store": probe_strided_store,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print("device:", jax.devices()[0].device_kind, flush=True)
    for n in names:
        check(n, PROBES[n])
