"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by running JAX on CPU
with 8 virtual devices (SURVEY.md §4: CPU mesh emulation), so these env vars
must be set before jax initializes.
"""

import os

# L2N_TEST_PLATFORM=tpu opts into running the hardware-only tests
# (tests/test_tpu_hw.py) against a real chip; the default suite runs on the
# virtual CPU mesh.
_ON_TPU = os.environ.get("L2N_TEST_PLATFORM") == "tpu"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by a pytest plugin with the ambient platform
# (env is snapshotted at import time) — force the config directly too.
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: interpret-mode kernel traces still pay real
# XLA:CPU compiles; caching them across runs shaves minutes off the suite.
from l2n_tpu.utils.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.Generator(np.random.PCG64(1234))
