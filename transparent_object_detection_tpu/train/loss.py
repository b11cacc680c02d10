"""Detection criterion: TAL assignment + CIoU + DFL + BCE.

Rebuild of the reference Loss/BboxLoss (model/loss.py:262-377) as a pure
function over raw head maps and *padded* targets — repairs bug B5 (undefined
self.no / assigner state) by construction and removes the per-image Python
preprocessing loop (loss.py:318-331): targets arrive as a fixed (B, M, 5)
tensor built by the data pipeline, so the whole criterion is one jit region.

Loss = 7.5 * CIoU + 0.5 * BCE + 1.5 * DFL (loss.py:374-376), each term
normalized by the total target score mass.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.models.blocks import dfl_expectation
from transparent_object_detection_tpu.ops.geometry import (
    bbox2dist,
    bbox_iou,
    dist2bbox,
    make_anchors,
    xywh2xyxy,
)
from transparent_object_detection_tpu.train.assigner import task_aligned_assign

Array = jax.Array


class LossConfig(NamedTuple):
    num_classes: int = 1
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    box_weight: float = 7.5
    cls_weight: float = 0.5
    dfl_weight: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    label_smoothing: float = 0.0  # wires the reference's dangling knob (train.py:124)


def _df_loss(pred_dist_logits: Array, target: Array) -> Array:
    """Distribution-focal cross-entropy on the two neighbor bins.

    pred_dist_logits: (..., 4, reg_max); target: (..., 4) continuous ltrb in
    [0, reg_max-1). Returns (...) mean over the 4 sides
    (BboxLoss._df_loss, loss.py:288-296).
    """
    logp = jax.nn.log_softmax(pred_dist_logits, axis=-1)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, logp.shape[-1] - 1)[..., None], axis=-1)[
        ..., 0
    ]
    return (ce_l * wl + ce_r * wr).mean(axis=-1)


def detection_loss(
    raw_maps: Sequence[Array],
    target_boxes: Array,
    target_labels: Array,
    cfg: LossConfig = LossConfig(),
) -> Tuple[Array, Dict[str, Array]]:
    """Full criterion (Loss.__call__, loss.py:339-377).

    Args:
      raw_maps: per-level head outputs, each (B, H_l, W_l, 4*reg_max + nc).
      target_boxes: (B, M, 4) normalized (cx, cy, w, h) in [0, 1]; padded
        slots are all-zero (the collate contract of dataloader.py:50-58
        lifted to fixed shape).
      target_labels: (B, M) int class ids; padding arbitrary.
      cfg: weights / TAL hyperparameters.

    Returns (total_loss scalar, components dict).
    """
    nc, reg_max = cfg.num_classes, cfg.reg_max
    b = raw_maps[0].shape[0]
    feat_shapes = tuple((m.shape[1], m.shape[2]) for m in raw_maps)
    strides = cfg.strides[: len(raw_maps)]

    flat = jnp.concatenate(
        [m.reshape(b, -1, 4 * reg_max + nc) for m in raw_maps], axis=1
    ).astype(jnp.float32)  # (B, A, no)
    pred_distri = flat[..., : 4 * reg_max]
    pred_scores = flat[..., 4 * reg_max :]
    a = flat.shape[1]

    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)  # (A,2),(A,1)
    img_h = feat_shapes[0][0] * strides[0]
    img_w = feat_shapes[0][1] * strides[0]

    # --- targets: normalized cxcywh -> pixel xyxy, validity from area ------
    scale = jnp.asarray([img_w, img_h, img_w, img_h], dtype=jnp.float32)
    gt_bboxes = xywh2xyxy(target_boxes.astype(jnp.float32) * scale)  # (B, M, 4)
    mask_gt = jnp.sum(gt_bboxes, axis=-1) > 0  # (B, M)  (loss.py:357)

    # --- decode predicted boxes in grid units (bbox_decode, loss.py:333-337)
    pred_dist = dfl_expectation(pred_distri.reshape(b, a, 4, reg_max), reg_max)
    pred_bboxes = dist2bbox(pred_dist, anchor_points[None], xywh=False)  # (B, A, 4)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
        anchor_points * stride_tensor,
        target_labels,
        gt_bboxes,
        mask_gt,
        num_classes=nc,
        topk=cfg.tal_topk,
        alpha=cfg.tal_alpha,
        beta=cfg.tal_beta,
    )

    target_bboxes = assign.target_bboxes / stride_tensor[None]  # grid units
    target_scores = assign.target_scores
    fg = assign.fg_mask.astype(jnp.float32)  # (B, A)
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # --- classification BCE (loss.py:368) ----------------------------------
    cls_targets = target_scores
    if cfg.label_smoothing > 0:
        cls_targets = cls_targets * (1.0 - cfg.label_smoothing) + 0.5 * cfg.label_smoothing
    bce = sigmoid_bce(pred_scores, cls_targets)
    loss_cls = bce.sum() / target_scores_sum

    # --- box CIoU (BboxLoss, loss.py:276-281) -------------------------------
    weight = target_scores.sum(axis=-1) * fg  # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, kind="ciou")
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    # --- DFL (loss.py:283-287) ---------------------------------------------
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    dfl = _df_loss(pred_distri.reshape(b, a, 4, reg_max), target_ltrb)  # (B, A)
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    total = (
        cfg.box_weight * loss_iou + cfg.cls_weight * loss_cls + cfg.dfl_weight * loss_dfl
    )
    components = {
        "loss": total,
        "loss_iou": loss_iou,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "num_fg": fg.sum(),
    }
    return total, components


def sigmoid_bce(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    # log(1 + exp(-|x|)) formulation; equivalent to BCEWithLogitsLoss(red='none')
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
