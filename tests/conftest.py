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
# Routed through enable_persistent_cache so the directory is keyed by the host
# CPU's feature set — XLA:CPU entries embed host-AOT code, and loading one
# produced on a different machine risks SIGILL.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Per-run skip inventory (VERDICT r3 weak #7: env-gated skips must be named
# in round artifacts so a silently-growing skip list can't rot unnoticed).
# Every full run writes tests/TESTS_LATEST.json with counts + each skip's
# location and reason; commit a copy as TESTS_r0N.json per round.
# ---------------------------------------------------------------------------
_skips: list = []
_counts = {"passed": 0, "failed": 0, "skipped": 0}


def pytest_runtest_logreport(report):
    if report.when == "call" and report.passed:
        _counts["passed"] += 1
    elif report.failed:
        _counts["failed"] += 1
    elif report.skipped:
        _counts["skipped"] += 1
        reason = ""
        if isinstance(report.longrepr, tuple):
            reason = report.longrepr[2]
        _skips.append({"test": report.nodeid, "reason": reason})


def pytest_sessionfinish(session, exitstatus):
    import json

    out = {
        "exit_status": int(exitstatus),
        # scoped runs understate totals — the args record the scope
        "args": list(session.config.invocation_params.args),
        **_counts,
        "skips": _skips,
    }
    path = os.path.join(os.path.dirname(__file__), "TESTS_LATEST.json")
    try:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
