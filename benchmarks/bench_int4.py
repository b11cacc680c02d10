#!/usr/bin/env python
"""Calibrate raw int4 MXU rates on this chip (v5e).

Question (VERDICT r2 #1 suggested int4/int8 mixed weights for the mlp
shapes): does the v5e MXU run int4 operands faster than int8, and does
XLA expose that through `dot_general`?  The published sheet lists int8 at
394 TOPS and says nothing about int4 — this measures it instead of
guessing.

Modes measured per shape (all `preferred_element_type=int32`):
  i8xi8   — baseline, matches the r3 calibration table
  i4xi4   — both operands int4
  i8xi4   — int8 activations x int4 weights (the production-relevant mix)

Counts "ops" as 2*M*K*N regardless of operand width so the numbers are
directly comparable.  Timing follows the repo convention: force completion
with a tiny value fetch (block_until_ready is unreliable on axon).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    # (M, K, N, tag)
    (8192, 8192, 8192, "square8k"),
    (204800, 1536, 6144, "mlp1"),
    (204800, 6144, 1536, "mlp2"),
]


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    only = os.environ.get("BENCH_SHAPE", "")
    modes = os.environ.get("BENCH_MODES", "i8xi8,i4xi4,i8xi4,i8_cvt").split(",")
    rng = np.random.default_rng(0)
    results = []
    for m, k, n, tag in SHAPES:
        if only and tag != only:
            continue
        ops = 2.0 * m * k * n
        x8 = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        row = {"shape": f"{m}x{k}x{n}", "tag": tag}

        def dot(a, b):
            acc = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.bfloat16)

        # int4 arrays cannot cross a jit boundary on axon (the relayout
        # device_put recurses forever) — fuse the int8→int4 narrowing into
        # the SAME jit as the dot. The narrowing pass costs ~0.5 ms vs the
        # dot's 3-11 ms, so the comparison stays meaningful; `i8_cvt` below
        # measures the same program shape with a no-op int8 "conversion" to
        # bound the overhead.
        def to4(a):
            return (a // 8).astype(jnp.int4)

        fns = {
            "i8xi8": jax.jit(dot),
            "i4xi4": jax.jit(lambda a, b: dot(to4(a), to4(b))),
            "i8xi4": jax.jit(lambda a, b: dot(a, to4(b))),
            # overhead control: identical extra elementwise pass, stays int8
            "i8_cvt": jax.jit(lambda a, b: dot(a, (b // 8).astype(jnp.int8))),
        }
        for mode in modes:
            fn = fns.get(mode)
            if fn is None:
                continue
            try:
                dt = timed(fn, x8, w8)
                row[mode + "_tops"] = round(ops / dt / 1e12, 1)
                row[mode + "_ms"] = round(dt * 1e3, 2)
            except Exception as e:  # noqa: BLE001 - record unsupported modes
                row[mode + "_err"] = str(e)[:120]
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
