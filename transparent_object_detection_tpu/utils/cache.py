"""Persistent XLA compilation cache setup.

The FOCUS 's' graph takes minutes to compile cold (particularly through a
remote-compile TPU tunnel); caching the serialized executables makes every
subsequent process start in seconds. Call early, before the first jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "TOD_TPU_XLA_CACHE", os.path.expanduser("~/.cache/tod_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
