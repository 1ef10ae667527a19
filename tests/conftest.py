"""Test configuration: run on CPU with a virtual 8-device mesh.

Must set XLA flags before the first jax import so sharding tests can use
an 8-device host platform (SURVEY.md §4d: multi-host simulation via
``xla_force_host_platform_device_count``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Hard-force CPU: the ambient environment may point JAX_PLATFORMS at a
# tunneled TPU (e.g. "axon"), which would make every parametrized test a
# remote compile.  Override with DMEL_TEST_PLATFORM to test on hardware.
_platform = os.environ.get("DMEL_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
# Persistent compilation cache: this sandbox shows rare multi-minute XLA
# compile stalls; caching makes reruns immune to them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_compilation_cache")

import jax  # noqa: E402

# The sandbox's sitecustomize registers a tunneled-TPU PJRT plugin and
# force-sets jax_platforms="axon,cpu" AFTER env parsing — re-override so
# tests really run on the local CPU with the virtual 8-device mesh.
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
