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
        pieces = [(idx, local)]
        buf = local
        src = idx
        for _ in range(n - 1):
            buf = jax.lax.ppermute(buf, axis_name, perm)
            src = (src - 1) % n
            pieces.append((src, buf))
        # Assemble in strip order: piece from shard k goes to slot k.
        slots = [None] * n
        for k, piece in pieces:
            # k is a traced scalar; place via one-hot sum to stay jittable.
            onehot = [jnp.where(jnp.equal(k, j), 1, 0) for j in range(n)]
            for j in range(n):
                contrib = piece * onehot[j].astype(piece.dtype)
                slots[j] = contrib if slots[j] is None else slots[j] + contrib
        return jnp.concatenate(slots, axis=1)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(None, axis_name, None),
        out_specs=P(), check_vma=False)(segments)
