"""Explicit collectives for plane reassembly (SURVEY.md §2.6 row
"distributed communication backend").

DCT blocks are independent, so the framework's ONLY cross-chip data
motion is reassembling the stereo mode's 64 coefficient planes from
per-shard strip segments (the multi-chip analog of the reference's
per-strip plane-cursor advance, src/simd_dct.cpp:1075-1083).  Three
equivalent implementations, strongest first:

* ``gather_planes_auto``   — GSPMD: a sharding constraint; XLA chooses
  the collective (what production code should use).
* ``gather_planes_ring``   — explicit ``lax.ppermute`` ring: N-1 hops,
  each hop moving one segment to the neighbor (the ICI-friendly
  pattern; also the shape a ``pltpu.make_async_remote_copy`` kernel
  would take on real multi-chip hardware, cf. SNIPPETS.md §[1]).
* ``gather_planes_allgather`` — one ``lax.all_gather``.

All are testable on the fake CPU mesh and must produce identical bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def gather_planes_auto(segments: jax.Array, mesh: Mesh) -> jax.Array:
    """(64, S, seg) strip-sharded -> replicated, via GSPMD."""
    return jax.lax.with_sharding_constraint(
        segments, NamedSharding(mesh, P()))


def gather_planes_allgather(segments: jax.Array, mesh: Mesh, *,
                            axis_name: str = DATA_AXIS) -> jax.Array:
    """Explicit all-gather over the strip axis inside shard_map."""
    def fn(local):
        return jax.lax.all_gather(local, axis_name, axis=1, tiled=True)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(None, axis_name, None),
        # This jax's vma analysis cannot infer replication even through a
        # tiled all_gather, so the check must stay off (verified: with it
        # on, tracing fails with "could not infer replication").
        out_specs=P(), check_vma=False)(segments)


def gather_planes_ring(segments: jax.Array, mesh: Mesh, *,
                       axis_name: str = DATA_AXIS) -> jax.Array:
    """Ring all-gather via lax.ppermute: each step sends the most
    recently received segment to the right neighbor.  Bandwidth-optimal
    on a ring interconnect (ICI): every link carries each byte once."""
    n = mesh.shape[axis_name]

    def fn(local):
        # local: (64, S/n, seg)
        idx = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % n) for i in range(n)]
        pieces = [local]
        buf = local
        for _ in range(n - 1):
            buf = jax.lax.ppermute(buf, axis_name, perm)
            pieces.append(buf)
        # pieces[t] came from shard (idx - t) % n, so reversed(pieces) is
        # ascending shard order starting at (idx + 1) % n; one dynamic
        # roll of (idx + 1) segments puts shard k's strip in slot k.
        seg = local.shape[1]
        stacked = jnp.concatenate(list(reversed(pieces)), axis=1)
        return jnp.roll(stacked, (idx + 1) * seg, axis=1)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(None, axis_name, None),
        # check_vma stays off: the roll distance is device-varying, so the
        # replication of the (identical) per-device results is not provable.
        out_specs=P(), check_vma=False)(segments)
