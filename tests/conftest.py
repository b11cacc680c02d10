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

# Modules dominated by whole-model builds, jitted training steps, or the
# Pallas interpreter — minutes each on a 1-vCPU rig. `pytest -m "not slow"`
# runs the pure-fn core suite (geometry/loss/assigner/NMS/eval/data/config);
# measured 5:28-6:24 with a warm XLA persistent cache / ~7 min cold on
# 1 vCPU (round 5; scripts/test_fast.sh). The full suite needs the batch
# split encoded in scripts/test_all.sh — a single process exceeds a
# 10-minute window here.
_SLOW_MODULES = {
    "test_api",
    "test_attention_mesh",
    "test_focus_import",
    "test_attention_vjp",
    "test_graft_entry",
    "test_inference",
    "test_model",
    "test_parallel",
    "test_parity_reference",
    "test_remat",
    "test_resume_and_reports",
    "test_tp",
    "test_train",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(11)
