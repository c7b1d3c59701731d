"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by running JAX on CPU
with 8 virtual devices (SURVEY.md §4: CPU mesh emulation), so these env vars
must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.Generator(np.random.PCG64(1234))
