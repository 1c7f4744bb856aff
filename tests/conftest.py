"""Test configuration: CPU backend with 8 virtual devices (sharding tests)
and float64 enabled (golden parity against the float64 PyTorch reference)."""
import os

# NB: with the axon TPU plugin, JAX_PLATFORMS=cpu is ignored; the singular
# JAX_PLATFORM_NAME (and the config knob below) do work.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# the suite is dominated by XLA compile time; persist compiled programs
# across runs (keyed by HLO hash, safe across code changes)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE", "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    def load(name):
        return np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    return load
