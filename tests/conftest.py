"""Test config: run all tests on CPU with 8 virtual devices so sharding/mesh logic is
exercised without TPU hardware (the driver separately dry-runs multichip compile)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon before conftest
# runs, so the env var alone is not enough — update the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
