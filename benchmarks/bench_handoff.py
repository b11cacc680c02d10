#!/usr/bin/env python
"""Measure the int8 mlp1->mlp2 handoff (quant_out producer -> x_quant
consumer) against the round-2 bf16-intermediate chain on the production
TEB mlp shapes (phi='s', batch 32).

Chain timed: mlp1 (LN+gelu, K->4K) -> mlp2 (residual, 4K->K).

  HOFF_MODE=base     bf16 intermediate (two plain quant_matmul calls)
  HOFF_MODE=handoff  int8 handoff (quant_out=True -> x_quant=...)

Env: HOFF_SHAPES=h2,h1,h4,h6 (default all), HOFF_ITERS (10).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# (tag, M, C) -> mlp1 (M, C)->(M, 4C), mlp2 (M, 4C)->(M, C)
SHAPES = [
    ("h2", 204800, 1536),
    ("h1", 51200, 2048),
    ("h4", 51200, 1536),
    ("h6", 12800, 2048),
]


def main():
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul

    mode = os.environ.get("HOFF_MODE", "handoff")
    iters = int(os.environ.get("HOFF_ITERS", "10"))
    sel = os.environ.get("HOFF_SHAPES")
    shapes = SHAPES if not sel else [s for s in SHAPES if s[0] in sel.split(",")]

    rng = np.random.default_rng(0)
    for tag, m, c in shapes:
        h = 4 * c
        x = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(c, h)) * 0.02, jnp.float32)
        b1 = jnp.zeros((h,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.02, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)
        g1 = jnp.ones((c,), jnp.float32)
        be1 = jnp.zeros((c,), jnp.float32)

        if mode == "base":

            @jax.jit
            def chain(x, w1, b1, g1, be1, w2, b2):
                z = quant_matmul(
                    x, w1, bias=b1, ln_scale=g1, ln_bias=be1, act="gelu",
                )
                return quant_matmul(z, w2, bias=b2, residual=x)

        else:

            @jax.jit
            def chain(x, w1, b1, g1, be1, w2, b2):
                z8 = quant_matmul(
                    x, w1, bias=b1, ln_scale=g1, ln_bias=be1, act="gelu",
                    quant_out=True,
                )
                return quant_matmul(None, w2, bias=b2, residual=x, x_quant=z8)

        out = chain(x, w1, b1, g1, be1, w2, b2)
        # value fetch, not block_until_ready: the relayed axon backend
        # returns from block_until_ready before execution finishes
        float(jnp.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        xi = out
        for _ in range(iters):
            xi = chain(xi, w1, b1, g1, be1, w2, b2)
        float(jnp.asarray(xi).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        tops = 2 * (2.0 * m * c * h) / dt / 1e12
        print(f"{tag} mode={mode}: {dt * 1e3:8.2f} ms  {tops:6.1f} TOPS "
              f"(M={m} C={c})", flush=True)


if __name__ == "__main__":
    main()
