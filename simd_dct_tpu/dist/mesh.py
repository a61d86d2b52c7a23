"""Device mesh construction and topology probing.

The TPU analog of the reference's "caller may shard rows" contract
(``startY``/``endY``, src/simd_dct.h:29-31): instead of a thread pool
splitting the strip loop, a ``jax.sharding.Mesh`` splits the strip axis
across chips/hosts, and XLA inserts any collectives (SURVEY.md §2.6).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None,
              axis_name: str = DATA_AXIS, devices=None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (default: all).

    DCT blocks are embarrassingly parallel, so a single data axis covers
    dp over strips/frames; ICI vs DCN placement follows device order.
    If the default platform cannot provide ``num_devices`` (e.g. one real
    TPU while testing an 8-way layout), the virtual CPU backend is used
    (``--xla_force_host_platform_device_count``)."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices and devices is None:
            cpu = jax.devices("cpu")
            if len(cpu) >= num_devices:
                devs = cpu
        if len(devs) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(shape: tuple[int, int],
                 axis_names: tuple[str, str] = ("host", "chip")) -> Mesh:
    """(host, chip) mesh for multi-host layouts: shard frames over hosts
    (DCN) and strips over chips (ICI).  Falls back to the virtual CPU
    backend when the default platform has too few devices (see make_mesh)."""
    need = shape[0] * shape[1]
    devs = jax.devices()
    if len(devs) < need:
        cpu = jax.devices("cpu")
        if len(cpu) >= need:
            devs = cpu
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(shape), axis_names)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           **kwargs) -> bool:
    """Multi-host bootstrap: ``jax.distributed.initialize`` with the
    standard env-var autodetection (SURVEY.md §2.6 "distributed
    communication backend" row).

    Call once per process before building meshes on a multi-host pod.
    Returns True if a distributed runtime is (now) initialized, False if
    this is a plain single-process run (no coordinator configured) —
    making it safe to call unconditionally from CLI entry points.
    Idempotent: re-initialization attempts are ignored.
    """
    from jax._src import distributed as _dist_state
    if getattr(_dist_state.global_state, "client", None) is not None:
        return True  # already initialized
    has_config = (coordinator_address is not None
                  or num_processes is not None
                  or any(k in os.environ for k in (
                      "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")))
    if not has_config:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def strip_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a (H, W) image: rows split across the mesh axis."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
