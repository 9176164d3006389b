"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count so pjit/shard_map paths compile and
execute with real collectives on 8 virtual CPU devices.

Note: this environment's sitecustomize pre-registers the axon TPU plugin
and exports JAX_PLATFORMS=axon, so the env var alone cannot select CPU --
the config API can.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
