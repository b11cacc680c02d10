"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code is validated without TPU hardware via
XLA's host-platform device-count override (the standard JAX trick).
Must run before jax is imported anywhere.
"""
import os

# Force-override: the environment may export JAX_PLATFORMS=axon (TPU tunnel)
# and a sitecustomize hook may import jax before this file runs, baking the
# env value into jax.config. Set both the env var (for subprocesses) and the
# live config (for this process).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/tod_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11)
