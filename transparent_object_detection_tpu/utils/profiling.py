"""Profiling & timing harness.

The reference's only perf tooling is a wall-clock fps loop
(predict.py:154-157) and thop FLOPs (summary.py:31-45). Here:

  * time_fn / throughput: block_until_ready-correct timing of jitted fns.
  * trace: jax.profiler trace context (view in TensorBoard / xprof).
  * cost_analysis: XLA's own FLOPs/bytes model for any jittable callable.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2, **kwargs) -> float:
    """Mean seconds per call of a (possibly jitted) function, dispatch-safe."""
    import jax

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput(fn: Callable, batch_size: int, *args, iters: int = 20, **kwargs) -> float:
    """Items/sec for a batched function."""
    return batch_size / time_fn(fn, *args, iters=iters, **kwargs)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — open the result with xprof/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """XLA cost model for fn(*example_args): flops, bytes accessed."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.cost_analysis() or {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
