#!/usr/bin/env python
"""Stage-level timing of the inference path on the current backend:
backbone / neck / head+decode / NMS, plus the full pipeline.

Used to direct kernel optimization; results print as one JSON line.
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
    # force full completion via tiny value fetch
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

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.config import ModelConfig, PredictConfig
    from transparent_object_detection_tpu.inference import detect_step
    from transparent_object_detection_tpu.models.backbone import Backbone
    from transparent_object_detection_tpu.models.detector import build_model, init_variables
    from transparent_object_detection_tpu.models.neck import Neck

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    phi = os.environ.get("BENCH_PHI", "s")
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    int8_attn = os.environ.get("BENCH_INT8_ATTN", "1" if int8 else "0") == "1"
    cfg = ModelConfig(num_classes=1, phi=phi, input_shape=(640, 640),
                      int8_dense=int8, int8_attn=int8 and int8_attn)
    model = build_model(cfg)
    variables = init_variables(model, cfg, seed=0)
    pred_cfg = PredictConfig(confidence=0.25, nms_iou=0.5, max_detections=100,
                             pre_nms_topk=256, nms_mode="fast")

    images = jax.random.uniform(jax.random.key(0), (batch, 640, 640, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[640.0, 640.0]], jnp.float32), (batch, 1))

    res = {"batch": batch, "phi": phi}

    # full pipeline
    step = jax.jit(functools.partial(detect_step, model,
                                     input_shape=cfg.input_shape, predict_cfg=pred_cfg))
    res["full_ms"] = round(timed(step, variables, images, shapes) * 1e3, 2)

    # backbone only
    bb = Backbone(cfg.base_channels, cfg.base_depth, cfg.deep_mul, dtype=jnp.bfloat16)
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x.astype(jnp.bfloat16), train=False))
    res["backbone_ms"] = round(timed(bb_fn, bb_vars, images) * 1e3, 2)

    # backbone + neck
    neck = Neck(cfg.base_channels, cfg.base_depth, cfg.deep_mul,
                num_heads=cfg.num_heads, dtype=jnp.bfloat16,
                lane_align_heads=cfg.lane_align_heads, int8_dense=cfg.int8_dense,
                int8_attn=cfg.int8_attn)
    nk_vars = {
        "params": variables["params"]["neck"],
        "batch_stats": variables["batch_stats"]["neck"],
    }

    def bb_neck(bv, nv, x):
        feats = bb.apply(bv, x.astype(jnp.bfloat16), train=False)
        return neck.apply(nv, feats, train=False)

    res["backbone_neck_ms"] = round(
        timed(jax.jit(bb_neck), bb_vars, nk_vars, images) * 1e3, 2
    )

    # full forward (adds head) without NMS
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["decoded"])
    res["forward_ms"] = round(timed(fwd, variables, images) * 1e3, 2)

    res["neck_ms"] = round(res["backbone_neck_ms"] - res["backbone_ms"], 2)
    res["head_ms"] = round(res["forward_ms"] - res["backbone_neck_ms"], 2)
    res["nms_ms"] = round(res["full_ms"] - res["forward_ms"], 2)
    res["imgs_per_sec"] = round(batch / (res["full_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
