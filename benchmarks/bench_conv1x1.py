#!/usr/bin/env python
"""Can the fused int8 matmul kernel beat XLA bf16 on the model's 1x1 convs?

A fused (conv+BN) 1x1 stride-1 conv IS a matmul: NHWC (B,H,W,Cin) reshaped
to (B*H*W, Cin) against the (Cin, Cout) kernel, bias add, SiLU. Round 2
only measured XLA's int8 *conv* path (slower than bf16 — docs/ROADMAP.md);
this benchmark routes the same shapes through ops/quant_matmul.py
(act="silu") and compares against the XLA bf16 matmul form, per shape and
weighted by occurrence in the phi='s' 640x640 batch-32 serving model.

Shapes are harvested from the real model by tracing a forward with
nn.Conv.__call__ instrumented — no hand-maintained shape table.

Env: C11_PHI (s), C11_BATCH (32), C11_SIZE (640), C11_ITERS (10),
C11_MODE=both|int8|bf16. One JSON line per distinct shape + a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def harvest_conv_shapes(phi: str, batch: int, size: int):
    """Trace the serving forward; return {(m, cin, cout): count} for fusable
    1x1 stride-1 ungrouped convs (post conv-BN fuse they are matmuls)."""
    from transparent_object_detection_tpu.config import SCALE_TABLE
    from transparent_object_detection_tpu.models.detector import FocusModel

    base_c, base_d, deep = SCALE_TABLE[phi]
    model = FocusModel(num_classes=80, base_channels=base_c,
                       base_depth=base_d, deep_mul=deep, dtype=jnp.bfloat16)

    log = []
    orig = nn.Conv.__call__

    def patched(self, x):
        ks = self.kernel_size
        k = ks[0] if isinstance(ks, (tuple, list)) else ks
        st = self.strides or 1
        s = st[0] if isinstance(st, (tuple, list)) else st
        if k == 1 and s == 1 and self.feature_group_count == 1:
            m = int(np.prod(x.shape[:-1]))
            log.append((m, int(x.shape[-1]), int(self.features)))
        return orig(self, x)

    nn.Conv.__call__ = patched
    try:
        x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, train=False)
        )
        jax.eval_shape(
            lambda v: model.apply(v, x, train=False), variables
        )
    finally:
        nn.Conv.__call__ = orig

    counts = {}
    for s in log:
        counts[s] = counts.get(s, 0) + 1
    return counts


def timed(f, *a, iters=10):
    o = f(*a)
    float(jnp.asarray(o).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    float(jnp.asarray(o).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul
    from transparent_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    phi = os.environ.get("C11_PHI", "s")
    batch = int(os.environ.get("C11_BATCH", "32"))
    size = int(os.environ.get("C11_SIZE", "640"))
    iters = int(os.environ.get("C11_ITERS", "10"))
    mode = os.environ.get("C11_MODE", "both")

    counts = harvest_conv_shapes(phi, batch, size)
    rng = np.random.default_rng(0)
    tot_bf16 = tot_int8 = 0.0
    for (m, cin, cout), cnt in sorted(counts.items(), key=lambda kv: -kv[0][0] * kv[0][1] * kv[0][2] * kv[1]):
        x = jnp.asarray(rng.normal(size=(m, cin)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        rec = {"m": m, "cin": cin, "cout": cout, "count": cnt,
               "gop": round(2.0 * m * cin * cout / 1e9, 2)}
        if mode in ("both", "bf16"):
            wb = w.astype(jnp.bfloat16)

            def f_bf16(x, wb, b):
                y = x @ wb + b.astype(jnp.bfloat16)
                return jax.nn.silu(y)

            t = timed(jax.jit(f_bf16), x, wb, b, iters=iters)
            rec["bf16_ms"] = round(t * 1e3, 3)
            rec["bf16_tflops"] = round(2.0 * m * cin * cout / t / 1e12, 1)
            tot_bf16 += t * cnt
        if mode in ("both", "int8"):
            f_int8 = jax.jit(
                lambda x, w, b: quant_matmul(x, w, bias=b, act="silu")
            )
            t = timed(f_int8, x, w, b, iters=iters)
            rec["int8_ms"] = round(t * 1e3, 3)
            rec["int8_tops"] = round(2.0 * m * cin * cout / t / 1e12, 1)
            tot_int8 += t * cnt
        print(json.dumps(rec), flush=True)

    summary = {"phi": phi, "batch": batch, "n_shapes": len(counts),
               "n_convs": sum(counts.values())}
    if tot_bf16:
        summary["total_bf16_ms"] = round(tot_bf16 * 1e3, 2)
    if tot_int8:
        summary["total_int8_ms"] = round(tot_int8 * 1e3, 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
