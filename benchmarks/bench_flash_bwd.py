#!/usr/bin/env python
"""Tile sweep for the Pallas flash-attention BACKWARD kernels.

The forward's narrow-q/wide-kv block study (round 2) was worth 10+ imgs/s;
the backward previously used a hardcoded <=400 cap on both blocks
(ops/attention.py). This bench times grad(sum(attention)) on the training
attention shapes under TOD_FLASH_BWD_BQ/BK caps — run ONE config per
process (the caps are read at trace time and the launcher is cached):

    TOD_FLASH_BWD_BQ=400 TOD_FLASH_BWD_BK=400 python benchmarks/bench_flash_bwd.py

Shapes: the phi='s' 640x640 batch-16 neck fusion TEBs — (16, 6400, 1536)
6 heads and (16, 1600, 2048) 8 heads (FBWD_SHAPES=big,small to select).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {
    "big": (16, 6400, 1536, 6),
    "small": (16, 1600, 2048, 8),
}


def main():
    from transparent_object_detection_tpu.ops.attention import attention
    from transparent_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    iters = int(os.environ.get("FBWD_ITERS", "10"))
    sel = os.environ.get("FBWD_SHAPES", "big,small").split(",")
    bq_cap = os.environ.get("TOD_FLASH_BWD_BQ", "400")
    bk_cap = os.environ.get("TOD_FLASH_BWD_BK", "400")

    rng = np.random.default_rng(0)
    for tag in sel:
        b, n, c, heads = SHAPES[tag]
        scale = 1.0 / np.sqrt(c // heads)
        q = jnp.asarray(rng.normal(size=(b, n, c)) * 0.2, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, n, c)) * 0.2, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, n, c)) * 0.2, jnp.bfloat16)

        def loss(q, k, v):
            o = attention(q, k, v, scale=scale, impl="pallas", num_heads=heads)
            return jnp.sum(o.astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        outs = g(q, k, v)
        float(outs[0].reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = g(q, k, v)
        float(outs[0].reshape(-1)[0].astype(jnp.float32))
        t = (time.perf_counter() - t0) / iters

        # fwd 2N^2(Cq+Cv) + bwd 2N^2(4Cq+3Cv) per batch elem (packed heads)
        flops = 2.0 * b * n * n * (5 * c + 4 * c)
        print(
            json.dumps(
                {
                    "tag": tag, "bq_cap": bq_cap, "bk_cap": bk_cap,
                    "ms": round(t * 1e3, 2),
                    "tflops": round(flops / t / 1e12, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
