"""Test configuration: force the CPU backend with 8 virtual devices so the
full suite (including sharding tests) runs without TPU hardware.

Must run before anything imports jax — pytest imports conftest first.
"""

import os
import sys

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on local CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent XLA cache outright: CLI tests call
# enable_persistent_cache() IN-PROCESS, so the suite gets no
# cross-process reuse from it, while BOTH cache paths have segfaulted
# jax mid-suite — deserializing a truncated entry (2026-08-18,
# get_executable_and_time; led to the per-run mkdtemp isolation) and
# then the WRITE path itself (2026-08-19, put_executable_and_time,
# VERDICT r4). 'off' is honored by utils.jaxcache and also skips
# serializing every >1s executable the suite compiles.
os.environ["RAYTRACER_TPU_CACHE"] = "off"
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
