#!/usr/bin/env python
"""Training-step throughput (BASELINE.json config 4: fine-tune with CIoU
loss + EMA): jitted forward+loss+grad+optimizer+EMA step at 640x640.

Env knobs: BENCH_PHI (default s), BENCH_BATCH (default 16),
BENCH_REMAT (default 1).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
    from transparent_object_detection_tpu.models.detector import build_model, init_variables
    from transparent_object_detection_tpu.train.optimizer import build_optimizer
    from transparent_object_detection_tpu.train.trainer import (
        create_train_state,
        loss_config_from,
        make_train_step,
    )

    phi = os.environ.get("BENCH_PHI", "s")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    remat = os.environ.get("BENCH_REMAT", "1") == "1"

    mc = ModelConfig(num_classes=1, phi=phi, input_shape=(640, 640), remat=remat)
    tc = TrainConfig(max_boxes=64, optimizer_type="sgd", ema=True)
    model = build_model(mc)
    variables = init_variables(model, mc, seed=0)
    tx = build_optimizer(tc, variables["params"])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, loss_config_from(mc, tc), tc, donate=True)

    rng = np.random.default_rng(0)
    boxes = np.zeros((batch, 64, 4), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.4]
    boxes[:, 1] = [0.25, 0.3, 0.2, 0.2]
    batch_data = {
        "image": jnp.asarray(rng.uniform(size=(batch, 640, 640, 3)), jnp.float32),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.zeros((batch, 64), jnp.int32),
    }
    lr = jnp.asarray(1e-3, jnp.float32)

    # FLOP accounting for the FULL train program (fwd + loss + bwd + opt +
    # EMA): XLA cost analysis of the compiled grad program plus the trace-
    # time Pallas log (flash fwd via the attention dispatcher, flash bwd via
    # the custom-VJP bwd hook) — same methodology as serving's bench.py.
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    flops_per_step = -1.0
    try:
        from transparent_object_detection_tpu.ops.attention import (
            start_flop_log,
            stop_flop_log,
        )

        start_flop_log()
        lowered = step.lower(state, batch_data, lr)
        log = stop_flop_log()
        flash_flops = sum(r["flops"] for r in log)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
        if xla_flops > 0:
            flops_per_step = xla_flops + flash_flops
    except Exception:
        pass

    state, comps = step(state, batch_data, lr)
    float(comps["loss"])  # force completion
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, comps = step(state, batch_data, lr)
    float(comps["loss"])
    dt = (time.perf_counter() - t0) / iters
    record = {
        "metric": "train step throughput 640x640 (fwd+loss+grad+opt+EMA)",
        "phi": phi,
        "batch": batch,
        "remat": remat,
        "step_ms": round(dt * 1e3, 1),
        "imgs_per_sec": round(batch / dt, 2),
    }
    if flops_per_step > 0:
        tflop_per_img = flops_per_step / batch / 1e12
        record["tflop_per_img"] = round(tflop_per_img, 4)
        record["achieved_tflops"] = round(flops_per_step / dt / 1e12, 1)
        record["mfu"] = round(flops_per_step / dt / 1e12 / peak_tflops, 4)
        record["ceiling_imgs_per_sec"] = round(
            batch * peak_tflops * 1e12 / flops_per_step, 1
        )
        # De facto ceiling: the training step is all-bf16 and its FLOPs are
        # dominated by conv fwd/bwd + TEB dense bwd dots; raw-XLA bf16 work
        # on these shapes measures ~150 TFLOP/s on v5e (not the 197 sheet
        # peak — same calibration argument as serving, docs/ROADMAP.md).
        raw_bf16 = float(os.environ.get("BENCH_RAW_BF16_TFLOPS", "150"))
        record["defacto_ceiling_imgs_per_sec"] = round(
            batch * raw_bf16 * 1e12 / flops_per_step, 1
        )
        record["defacto_mfu"] = round(
            flops_per_step / dt / 1e12 / raw_bf16, 4
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
