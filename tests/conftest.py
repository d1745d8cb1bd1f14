"""Test configuration: force the CPU backend with 8 virtual devices so the
full suite (including sharding tests) runs without TPU hardware.

Must run before anything imports jax — pytest imports conftest first.
"""

import os
import sys
import tempfile

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on local CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# Isolate the persistent XLA cache: CLI tests call
# enable_persistent_cache() IN-PROCESS, which would otherwise point the
# whole pytest process at the shared on-disk cache — a killed test run
# can leave a truncated entry there, and deserializing one SEGFAULTS
# jax (observed 2026-08-18: crash in compilation_cache.
# get_executable_and_time mid-suite). A per-run temp dir keeps test
# cache traffic away from the CLI/bench/device cache entirely.
os.environ["RAYTRACER_TPU_CACHE"] = tempfile.mkdtemp(prefix="rt_test_xla_")
os.environ["XLA_PYTHON_CLIENT_PREALLOCATE"] = "false"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize (the TPU-tunnel boot hook) imports jax before conftest runs,
# so the env var above is too late for platform selection — force it here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
