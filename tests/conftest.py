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
# Persistent compile cache: this box has ONE core and the heavier jitted graphs
# (resident/fused train steps) take minutes to compile; caching makes test
# reruns and the slow e2e group dramatically cheaper.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SALSA_TEST_JIT_CACHE", "/tmp/salsa_tpu_test_jit_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
