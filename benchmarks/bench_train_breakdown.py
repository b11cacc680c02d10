#!/usr/bin/env python
"""Stage-level timing of the TRAINING step (the serving twin is
bench_breakdown.py): forward / +loss / +backward / full step (+optimizer,
EMA), plus the loss-only program that isolates the TAL assigner cost.

Prints one JSON line. Env: BENCH_PHI (s), BENCH_BATCH (16), BENCH_SIZE (640).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
    from transparent_object_detection_tpu.models.detector import build_model, init_variables
    from transparent_object_detection_tpu.train.loss import detection_loss
    from transparent_object_detection_tpu.train.optimizer import build_optimizer
    from transparent_object_detection_tpu.train.trainer import (
        create_train_state,
        loss_config_from,
        make_train_step,
    )

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "640"))
    phi = os.environ.get("BENCH_PHI", "s")
    mc = ModelConfig(num_classes=1, phi=phi, input_shape=(size, size))
    tc = TrainConfig(max_boxes=128)
    model = build_model(mc)
    variables = init_variables(model, mc, seed=0)
    lc = loss_config_from(mc, tc)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)
    boxes = jnp.zeros((batch, tc.max_boxes, 4), jnp.float32).at[:, 0].set(
        jnp.asarray([0.5, 0.5, 0.4, 0.4])
    )
    labels = jnp.zeros((batch, tc.max_boxes), jnp.int32)
    batch_d = {"image": images, "boxes": boxes, "labels": labels}

    res = {"batch": batch, "phi": phi, "size": size}

    # forward only (train mode, mutable BN)
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])[0]["raw"]
    )
    res["forward_ms"] = round(timed(fwd, variables, images) * 1e3, 2)

    # loss only, on fixed raw maps (isolates TAL assigner + CIoU + DFL)
    raw = jax.tree_util.tree_map(jax.lax.stop_gradient, fwd(variables, images))
    loss_only = jax.jit(lambda r, b, l: detection_loss(r, b, l, lc)[0])
    res["loss_only_ms"] = round(timed(loss_only, raw, boxes, labels) * 1e3, 2)

    # forward + loss + backward
    def loss_fn(params, bs, x, b, l):
        out, mut = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True, mutable=["batch_stats"]
        )
        total, _ = detection_loss(out["raw"], b, l, lc)
        return total

    grad_fn = jax.jit(jax.grad(loss_fn))
    res["fwd_bwd_ms"] = round(
        timed(grad_fn, variables["params"], variables["batch_stats"], images, boxes, labels)
        * 1e3,
        2,
    )

    # full step: fwd + loss + bwd + clip + sgd + EMA, with the state DONATED
    # and rebound each call — the production Trainer.fit pattern. (A
    # donate=False measurement overstates the optimizer tail by ~4 GB of
    # state re-materialization: params, momentum, and both EMA trees get
    # fresh buffers instead of in-place updates.)
    tx = build_optimizer(tc, variables["params"])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, lc, tc, donate=True)
    lr = jnp.asarray(1e-3, jnp.float32)
    state, m = step(state, batch_d, lr)
    float(jax.tree_util.tree_leaves(m)[0])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d, lr)
    float(jax.tree_util.tree_leaves(m)[0])
    res["full_step_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

    res["bwd_ms"] = round(res["fwd_bwd_ms"] - res["forward_ms"] - res["loss_only_ms"], 2)
    # Approximate residual: full_step is donated but fwd_bwd is not, so the
    # subtraction mixes donation methodologies and can understate (even go
    # negative on) the optimizer tail. Kept as an indicative number only.
    res["opt_ema_ms_approx"] = round(res["full_step_ms"] - res["fwd_bwd_ms"], 2)
    res["imgs_per_sec"] = round(batch / (res["full_step_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
