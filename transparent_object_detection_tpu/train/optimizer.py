"""Optimizer assembly: param groups, weight-decay masking, freeze masking.

Rebuild of the reference's three-param-group optimizer setup
(train.py:349-366): BN/norm scales and biases take no weight decay, conv /
dense kernels do; SGD uses nesterov momentum 0.937, Adam betas
(0.937, 0.999). Gradient clipping (global norm 10.0, train_step.py:59) is
part of the chain.

The chain deliberately ends BEFORE learning-rate scaling: the trainer passes
the epoch lr into the jitted step as a scalar (mirroring set_optimizer_lr's
per-epoch assignment) and applies `-lr * update`. Backbone freezing
(train.py:332-334) is a leaf mask applied to the final updates, so optimizer
state keeps a stable structure across the freeze -> unfreeze transition.
"""
from __future__ import annotations

from typing import Any

import jax
import optax

from transparent_object_detection_tpu.config import TrainConfig


def weight_decay_mask(params: Any) -> Any:
    """True for leaves that should receive weight decay: matrix/conv kernels
    only (the reference's pg1; norm scales pg0 and biases pg2 are exempt)."""

    def mask_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return bool(names) and names[-1] == "kernel"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def backbone_frozen_mask(params: Any) -> Any:
    """True for every leaf under the 'backbone' subtree (freeze phase)."""

    def mask_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return "backbone" in names

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    """Gradient -> unscaled update direction (lr applied by the trainer)."""
    chain = [optax.clip_by_global_norm(cfg.grad_clip_norm)]
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay, weight_decay_mask(params)))
    if cfg.optimizer_type == "sgd":
        chain.append(optax.trace(decay=cfg.momentum, nesterov=True))
    elif cfg.optimizer_type == "adam":
        chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=0.999))
    else:
        raise ValueError(f"unsupported optimizer_type {cfg.optimizer_type!r}")
    return optax.chain(*chain)
