#!/usr/bin/env python
"""High-res 1280x1280 inference, data-parallel across the device mesh
(BASELINE.json config 5).

Shards the batch over every visible chip; on the CPU test rig this also
validates the sharded executable (XLA_FLAGS=--xla_force_host_platform_device_count=8).
At 1280x1280 the P3 attention span is 160x160 = 25,600 tokens — only the
streaming flash-attention path makes this runnable at all.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.config import ModelConfig, PredictConfig
    from transparent_object_detection_tpu.inference import detect_step
    from transparent_object_detection_tpu.models.detector import build_model, init_variables
    from transparent_object_detection_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated,
    )

    per_chip = int(os.environ.get("BENCH_BATCH_PER_CHIP", "2"))
    phi = os.environ.get("BENCH_PHI", "s")
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch = per_chip * n_dev
    if n_dev > 1:
        from transparent_object_detection_tpu.ops.attention import set_attention_mesh

        set_attention_mesh(mesh)

    int8 = os.environ.get("BENCH_INT8", "1") == "1"
    cfg = ModelConfig(num_classes=1, phi=phi, input_shape=(1280, 1280),
                      int8_dense=int8, int8_attn=int8)
    model = build_model(cfg)
    variables = init_variables(model, cfg, seed=0)
    variables = jax.device_put(variables, replicated(mesh))
    pred_cfg = PredictConfig(confidence=0.25, nms_iou=0.5, max_detections=100,
                             pre_nms_topk=256, nms_mode="fast")

    step = jax.jit(functools.partial(detect_step, model,
                                     input_shape=cfg.input_shape, predict_cfg=pred_cfg))

    bs = batch_sharding(mesh)
    images = jax.device_put(
        jax.random.uniform(jax.random.key(0), (batch, 1280, 1280, 3), jnp.float32), bs
    )
    shapes = jax.device_put(
        jnp.tile(jnp.asarray([[1280.0, 1280.0]], jnp.float32), (batch, 1)), bs
    )

    out = step(variables, images=images, image_shapes=shapes)
    float(out["num_detections"].sum())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, images=images, image_shapes=shapes)
    float(out["num_detections"].sum())
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": "1280x1280 multi-scale inference, data-parallel",
                "devices": n_dev,
                "batch": batch,
                "imgs_per_sec": round(batch / dt, 2),
                "imgs_per_sec_per_chip": round(batch / dt / n_dev, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
