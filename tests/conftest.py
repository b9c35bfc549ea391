"""Test configuration: force an 8-device virtual CPU mesh so multi-device
sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers the 'axon' TPU platform
and re-sets jax_platforms after import, so the env var alone is not
enough — the config-level update below is what actually wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
