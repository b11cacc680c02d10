#!/usr/bin/env python
"""Per-chip HBM budget for serving each phi scale under dp x tp meshes.

Zero-allocation accounting (jax.eval_shape on model.init — no weights are
materialized), printed as one JSON line per (phi, tp). Answers the VERDICT
question "show phi='l' 640² serving fits 4-8 chips": weights are counted at
their stored fp32 width, split into TEB-projection weights (sharded 1/tp by
parallel/tp.py + ops/teb_tp.py) and everything else (replicated); the
activation peak is estimated from the largest TEB's live set under the
Megatron sharding (tokens + residual full-width, qkv/gelu intermediates at
1/tp width) plus the backbone's peak feature map — an upper-bound envelope,
not a compiler simulation.

Measured-vs-envelope (the envelope's observed error band, both points
single-chip 640² int8 serving on v5e silicon):

  phi='l' batch 4:  predicted 34.0 GB, measured 36.7 GB (allocator OOM
                    report, r3)            -> envelope −7.4% UNDER
  phi='m' batch 16: predicted 10.9 GB, measured 11.15 GB (compiler buffer
                    assignment: BENCH_PHI=m BENCH_BATCH=16 BENCH_HBM=1
                    bench.py, peak_hbm_source=compiled.memory_analysis, r5)
                                           -> envelope −2.2% UNDER
  phi='m' batch 32: predicted 16.76 GB (> 15.75 chip) — and silicon indeed
                    OOMs (README model-scale sweep note), sign agrees.

So treat every "fits" verdict with ≤8% headroom as provisional: the
phi='x' tp=8 claim (13.0 GB vs a 14.18 GB limit = 90% of the 15.75 GB
chip, leaving the usual ~10% runtime/fragmentation reserve) survives
the worst observed error (13.0 x 1.074 = 14.0 GB) with 1.3% to spare —
but nothing smaller. The two measured points use different accounting
(allocator peak vs buffer assignment); the band conservatively spans both.

Usage: python benchmarks/hbm_budget.py [phi ...]   (default: s m l x)
Env: HBM_BATCH (default 4), HBM_SIZE (default 640), HBM_GB (chip HBM, 15.75).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.config import ModelConfig
from transparent_object_detection_tpu.models.detector import build_model

TEB_PROJ = ("qkv", "attn_out", "mlp1", "mlp2")


def weight_bytes(shapes, tp: int, kernel_bytes: int) -> tuple[float, int, int]:
    """(per-chip weight bytes, total params, sharded params) mirroring the
    Predictor's TP placement: TEB projections and >=1M-element kernels with
    a tp-divisible output axis are sharded 1/tp (parallel/tp.py
    tp_param_spec); kernels are stored at the compute width (bf16 in
    production — inference.Predictor pre-casts); everything else fp32
    replicated."""
    from transparent_object_detection_tpu.parallel.tp import (
        GENERIC_SHARD_MIN_SIZE,
    )

    per_chip = 0.0
    total = sharded = 0
    def walk(tree, in_proj, name):
        nonlocal per_chip, total, sharded
        if hasattr(tree, "size"):
            size = int(tree.size)
            total += size
            is_kernel = name == "kernel" and tree.ndim >= 2
            nbytes = kernel_bytes if is_kernel else 4
            shard = is_kernel and (
                in_proj
                or (size >= GENERIC_SHARD_MIN_SIZE and tree.shape[-1] % tp == 0)
            )
            if shard:
                sharded += size
                per_chip += size * nbytes / tp
            else:
                per_chip += size * nbytes
            return
        for key, val in tree.items():
            walk(val, in_proj or key in TEB_PROJ, key)
    walk(shapes, False, "")
    return per_chip, total, sharded


def teb_widths(cfg: ModelConfig) -> list[int]:
    c = cfg.base_channels
    c5 = int(c * 16 * cfg.deep_mul)
    return [c5 + 8 * c, 8 * c + 4 * c, 4 * c + 8 * c, 8 * c + c5]


def budget(phi: str, batch: int, size: int, tp: int, dp: int = 1) -> dict:
    cfg = ModelConfig(num_classes=1, phi=phi, input_shape=(size, size))
    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.float32),
            train=True,
        )
    )
    kernel_bytes = 2 if tp > 1 else 4  # Predictor stores bf16 kernels under TP
    w_chip, total_p, sharded_p = weight_bytes(shapes["params"], tp, kernel_bytes)
    bs_p = sum(int(x.size) for x in jax.tree_util.tree_leaves(shapes["batch_stats"]))
    w_bytes = w_chip + 4 * bs_p

    # activation envelope: the largest TEB's live set at its token count.
    # Per TEB at (B/dp, N, C): tokens + residual + attn-out full-width bf16,
    # qkv (3C/tp) + gelu intermediate (4C/tp) bf16, plus one concat input
    # (B/dp, H, W, C) bf16 upstream of it. Token maps: h1/h4 at /16,
    # h2 at /8, h6 at /32.
    h, w = cfg.input_shape
    strides = (16, 8, 16, 32)
    bl = max(batch // dp, 1)
    act_peak = 0
    for width, s in zip(teb_widths(cfg), strides):
        n = (h // s) * (w // s)
        full = 3 * bl * n * width * 2          # tokens, residual, attn out
        sharded = bl * n * (3 * width + 4 * width) * 2 / tp  # qkv + gelu
        act_peak = max(act_peak, full + sharded)
    # backbone peak: stem-out (B, H/2, W/2, C) bf16 x2 (double-buffered fusion)
    act_peak = max(act_peak, 2 * bl * (h // 2) * (w // 2) * cfg.base_channels * 2)

    hbm_gb = float(os.environ.get("HBM_GB", "15.75"))
    total = w_bytes + act_peak
    return {
        "phi": phi,
        "input": size,
        "batch": batch,
        "dp": dp,
        "tp": tp,
        "params_M": round(total_p / 1e6, 1),
        "sharded_params_M": round(sharded_p / 1e6, 1),
        "weights_gb_per_chip": round(w_bytes / 2**30, 2),
        "act_envelope_gb_per_chip": round(act_peak / 2**30, 2),
        "total_gb_per_chip": round(total / 2**30, 2),
        "chip_hbm_gb": hbm_gb,
        "fits": bool(total / 2**30 < hbm_gb * 0.9),  # 10% runtime headroom
    }


def main():
    phis = sys.argv[1:] or ["s", "m", "l", "x"]
    batch = int(os.environ.get("HBM_BATCH", "4"))
    size = int(os.environ.get("HBM_SIZE", "640"))
    for phi in phis:
        for dp, tp in ((1, 1), (1, 2), (1, 4), (2, 4), (1, 8)):
            print(json.dumps(budget(phi, batch, size, tp, dp)))


if __name__ == "__main__":
    main()
