"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard JAX way: force the host platform
and fake 8 devices via XLA flags (SURVEY.md §4).  This must happen before
jax initializes a backend, hence at conftest import time.
"""

import os

# The session sitecustomize registers the 'axon' TPU-tunnel PJRT plugin and
# programmatically sets jax.config.jax_platforms = "axon,cpu", which wins
# over the JAX_PLATFORMS env var.  Tests must run on the local virtual CPU
# mesh (fast, hermetic, 8 fake devices), so override via jax.config before
# any backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
