"""Persistent-compile-cache helper: host-keyed CPU cache directories.

XLA:CPU cache entries embed AOT host code; a cache written on one machine
must be invisible on another (the loader otherwise warns about SIGILL).
On the CPU backend enable_persistent_cache therefore appends a stable
per-host suffix.
"""
import jax

from fabstir_vectordb_tpu.utils.compile_cache import (
    DEFAULT_DIR,
    _host_key,
    enable_persistent_cache,
)


def test_host_key_stable_and_short():
    k1, k2 = _host_key(), _host_key()
    assert k1 == k2
    assert len(k1) == 8
    int(k1, 16)  # hex


def test_cpu_cache_dir_is_host_keyed(tmp_path):
    # tests always run on the CPU backend (conftest forces it)
    assert jax.default_backend() == "cpu"
    base = str(tmp_path / "cache")
    got = enable_persistent_cache(base)
    assert got == f"{base}-cpu-{_host_key()}"
    assert jax.config.jax_compilation_cache_dir == got
    # restore the suite-wide cache dir for subsequent tests
    import os

    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    )


def test_default_dir_points_into_repo():
    assert DEFAULT_DIR.endswith(".jax_tpu_cache")
