"""Optimizer assembly: param groups, weight-decay masking, freeze masking.

Rebuild of the reference's three-param-group optimizer setup
(train.py:349-366): BN/norm scales and biases take no weight decay, conv /
dense kernels do; SGD uses nesterov momentum 0.937, Adam betas
(0.937, 0.999). Gradient clipping (global norm 10.0, train_step.py:59) is
part of the chain.

The chain deliberately ends BEFORE learning-rate scaling: the trainer passes
the epoch lr into the jitted step as a scalar (mirroring set_optimizer_lr's
per-epoch assignment) and applies `-lr * update`. Backbone freezing
(train.py:332-334) matches the reference's requires_grad=False semantics:
frozen gradients are zeroed BEFORE the chain (so clip_by_global_norm and
momentum never see them) and weight decay is mask-excluded for frozen leaves
(so momentum/Adam state for frozen params stays exactly zero through the
freeze phase). The frozen-phase chain has the identical state structure, so
one opt_state carries across the freeze -> unfreeze transition.
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


def build_optimizer(
    cfg: TrainConfig, params: Any, freeze_backbone: bool = False
) -> optax.GradientTransformation:
    """Gradient -> unscaled update direction (lr applied by the trainer).

    With freeze_backbone=True the weight-decay mask additionally excludes
    backbone leaves; combined with pre-chain gradient zeroing in the train
    step, frozen leaves see exactly zero updates and accumulate exactly zero
    momentum/Adam moments — the requires_grad=False analog. The chain (and
    thus the optimizer-state structure) is identical either way.
    """
    chain = [optax.clip_by_global_norm(cfg.grad_clip_norm)]
    if cfg.weight_decay:
        wd_mask = weight_decay_mask(params)
        if freeze_backbone:
            frozen = backbone_frozen_mask(params)
            wd_mask = jax.tree_util.tree_map(lambda w, f: w and not f, wd_mask, frozen)
        chain.append(optax.add_decayed_weights(cfg.weight_decay, wd_mask))
    if cfg.optimizer_type == "sgd":
        chain.append(optax.trace(decay=cfg.momentum, nesterov=True))
    elif cfg.optimizer_type == "adam":
        chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=0.999))
    else:
        raise ValueError(f"unsupported optimizer_type {cfg.optimizer_type!r}")
    return optax.chain(*chain)
