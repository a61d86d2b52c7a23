"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard JAX way: force the host platform
and fake 8 devices via XLA flags (SURVEY.md §4).  This must happen before
jax initializes a backend, hence at conftest import time.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real-TPU tunnel);
# tests must run on the virtual CPU mesh, so override rather than default.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
