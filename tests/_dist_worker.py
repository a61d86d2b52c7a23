"""Worker process for the 2-process jax.distributed CPU cluster test.

Run as:  python tests/_dist_worker.py <coordinator_port> <process_id>

Exercises the REAL multi-host bootstrap path (dist.initialize_distributed
-> jax.distributed.initialize) plus a cross-process collective: a strip-
sharded stereo encode over the 2-process mesh followed by a gathered
plane reassembly (gloo all-gather over the process boundary).  Prints
DIST_OK on success; any assertion/exception exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one local CPU device per process -> the 2-process cluster has 2 global
# devices; must be set before jax initializes
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1 "
                           + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

from simd_dct_tpu.dispatch.capability import honor_cpu_platform_env  # noqa: E402

honor_cpu_platform_env()
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> int:
    port = int(sys.argv[1])
    pid = int(sys.argv[2])

    import numpy as np
    from simd_dct_tpu import dist
    from simd_dct_tpu.core import default_quant_lut
    from simd_dct_tpu.kernels import xla_path as X

    ok = dist.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert ok is True, "initialize_distributed must report initialized"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()
    assert len(jax.local_devices()) == 1

    mesh = dist.make_mesh(2)

    # deterministic input on every process; H2 = 256 -> 2 shards x 128
    # rows: panel-aligned shards keep the sharded and single-chip float
    # paths identical (bit-equal), like tests/test_dist.py's fixture
    rng = np.random.default_rng(0xD157)
    img = rng.integers(0, 256, (512, 128), dtype=np.uint8)

    # strip-sharded global input: each process contributes its local shard
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data", None))
    gimg = jax.make_array_from_callback(
        img.shape, sharding, lambda idx: img[idx])

    lut = default_quant_lut(50)

    # sharded stereo encode + gathered plane reassembly: the gather is a
    # REAL cross-process collective (gloo all-gather)
    full = dist.encode_quantize_stereo_sharded(gimg, lut, mesh, gather=True)
    assert full.sharding.is_fully_replicated
    got = np.asarray(full).reshape(-1)

    want = np.asarray(X.encode_quantize_stereo(
        jax.numpy.asarray(img), jax.numpy.asarray(lut)))
    assert np.array_equal(got, want), (
        f"sharded+gathered bytes diverge: {int((got != want).sum())} bad")

    # mode32 strip-dp as well: per-shard fused path, no collective
    rec = dist.encode_quantize32_sharded(
        gimg, default_quant_lut(50) * 255.0, mesh)
    local = [s for s in rec.addressable_shards]
    assert local, "each process must hold a shard"

    print(f"DIST_OK process={pid} checksum={int(got.astype(np.int64).sum())}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
