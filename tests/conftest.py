"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

The test suite must run without TPU hardware; multi-chip sharding tests use
XLA's host-platform device virtualization (8 CPU devices).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone can be overridden by platform plugins (e.g. a TPU tunnel
# registered via sitecustomize); force the CPU backend explicitly so tests
# always run on the 8-device virtual host platform.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent compilation cache: kernel shapes repeat across test files/processes.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
