"""Test configuration: run everything on CPU with 8 virtual devices.

This is the fake-backend mechanism the torch reference lacks (SURVEY §4):
multi-chip sharding tests execute on a virtual 8-device CPU mesh via
``xla_force_host_platform_device_count``, so `pjit`/`shard_map` paths are
validated without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config API does not.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
