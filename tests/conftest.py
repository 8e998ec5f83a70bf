"""Test environment notes.

On this box the axon sitecustomize pins JAX to the TPU backend at interpreter
start, so in-process env overrides cannot move tests to CPU — and that's fine:
unit/integration tests run on the real target chip. Multi-device sharding
tests (which need an 8-device virtual CPU mesh) run in subprocesses with
JAX_PLATFORM_NAME=cpu + --xla_force_host_platform_device_count=8; see
tests/test_multichip.py and the `cpu_mesh_env` fixture here.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Modules whose tests spawn subprocess compiles or multi-minute on-chip
# renders. `pytest -m "not slow"` is the sub-5-minute inner loop; the full
# suite (default invocation) still runs everything.
_SLOW_MODULES = {
    "test_cache", "test_stream", "test_raystream", "test_multichip",
    "test_golden", "test_oracle", "test_bfstream",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def cpu_mesh_env():
    """Environment for subprocesses needing an 8-device virtual CPU mesh."""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    # pure-CPU subprocesses must not register the axon TPU backend at all:
    # registration dials the relay at interpreter start, so a dead/busy
    # tunnel would hang these tests even though they never use the chip
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    return env


def run_in_cpu_mesh(code: str, env, timeout=600) -> str:
    """Run python code in a subprocess on the virtual CPU mesh."""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout
