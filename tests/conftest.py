"""Test config: run JAX on a virtual 8-device CPU mesh.

Sharding logic is exercised without TPUs via
``xla_force_host_platform_device_count`` (SURVEY.md §4 point 3).  Env vars
must be set before jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin pins JAX_PLATFORMS=axon at interpreter startup via
# sitecustomize; env vars alone cannot override it, so force the CPU backend
# through jax.config before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
