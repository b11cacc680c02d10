"""Task-Aligned Assigner — fixed-shape, fully vectorized, jit-native.

Rebuild of the reference TaskAlignedAssigner + helpers
(model/loss.py:10-57, 140-260). Differences by design:

  * Pure function: every input is an argument (the reference mutates
    self.bs/self.n_max_boxes that are never set — bug B5).
  * Padded ground truth: (B, M) slots with a validity mask instead of the
    reference's ragged per-image tensors, so every shape is static under jit.
  * No roll_out loop variant: the vectorized path IS the TPU path; the
    reference's python batch loop (loss.py:27-31) would serialize on device.
  * top-k membership is computed by comparing top-k indices against an
    anchor iota (pure VPU compare+reduce) instead of one_hot+scatter —
    scatters are the slow path on TPU.

Semantics match the reference exactly, including the quirk that padded /
masked top-k slots collapse onto anchor index 0 and are then discarded by
the duplicate-count rule (loss.py:243-252).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.ops.geometry import bbox_iou

Array = jax.Array


class AssignResult(NamedTuple):
    target_labels: Array  # (B, A) int32
    target_bboxes: Array  # (B, A, 4) xyxy, same units as gt_bboxes
    target_scores: Array  # (B, A, C) soft targets (TAL-normalized)
    fg_mask: Array  # (B, A) bool
    target_gt_idx: Array  # (B, A) int32


def candidates_in_gts(anc_points: Array, gt_bboxes: Array, eps: float = 1e-9) -> Array:
    """Anchor centers strictly inside GT boxes (loss.py:10-35).

    anc_points: (A, 2); gt_bboxes: (B, M, 4) xyxy. Returns (B, M, A) bool.
    """
    lt = gt_bboxes[..., None, 0:2]  # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate(
        [anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1
    )  # (B, M, A, 4)
    return jnp.min(deltas, axis=-1) > eps


def topk_membership(metrics: Array, topk: int, topk_mask: Array) -> Array:
    """Per-GT top-k anchor membership with the reference's duplicate rule.

    metrics: (B, M, A); topk_mask: (B, M) valid-GT mask.
    Returns (B, M, A) float 0/1 (select_topk_candidates, loss.py:233-253).
    """
    a = metrics.shape[-1]
    k = min(topk, a)
    _, topk_idxs = jax.lax.top_k(metrics, k)  # (B, M, k)
    # Masked GT rows collapse all k indices to 0 (reference sets idx 0, then
    # the count>1 rule erases anchor 0 for that row).
    topk_idxs = jnp.where(topk_mask[..., None], topk_idxs, 0)
    anchor_iota = jnp.arange(a, dtype=topk_idxs.dtype)
    counts = (topk_idxs[..., None] == anchor_iota).sum(axis=-2)  # (B, M, A)
    return jnp.where(counts > 1, 0, counts).astype(metrics.dtype)


def resolve_multi_gt(mask_pos: Array, overlaps: Array):
    """Anchors claimed by several GTs go to the highest-IoU GT (loss.py:37-57).

    mask_pos, overlaps: (B, M, A). Returns (target_gt_idx (B, A),
    fg_mask (B, A), mask_pos (B, M, A)).
    """
    m = mask_pos.shape[1]
    fg_count = mask_pos.sum(axis=-2)  # (B, A)
    max_idx = jnp.argmax(overlaps, axis=1)  # (B, A)
    is_max = jax.nn.one_hot(max_idx, m, axis=1, dtype=mask_pos.dtype)  # (B, M, A)
    mask_pos = jnp.where((fg_count[:, None, :] > 1), is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)
    return target_gt_idx, fg_mask, mask_pos


def task_aligned_assign(
    pd_scores: Array,
    pd_bboxes: Array,
    anc_points: Array,
    gt_labels: Array,
    gt_bboxes: Array,
    mask_gt: Array,
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    """Assign padded GTs to anchors by the task-aligned metric s^a * iou^b.

    Args:
      pd_scores: (B, A, C) sigmoided class scores (caller detaches).
      pd_bboxes: (B, A, 4) xyxy predictions, same units as gt_bboxes.
      anc_points: (A, 2) anchor centers, same units.
      gt_labels: (B, M) int class ids (padded slots arbitrary).
      gt_bboxes: (B, M, 4) xyxy (padded slots all-zero).
      mask_gt: (B, M) bool validity.
      num_classes, topk, alpha, beta, eps: TAL hyperparameters
        (reference Loss config: topk=10, alpha=0.5, beta=6.0, loss.py:313).
    """
    b, a, c = pd_scores.shape
    m = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(pd_scores.dtype)

    # --- alignment metric (get_box_metrics, loss.py:214-231) --------------
    overlaps = jnp.clip(
        bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, kind="ciou"),
        0.0,
    )  # (B, M, A)
    # bbox_scores[b, m, a] = pd_scores[b, a, gt_labels[b, m]]
    labels_safe = jnp.clip(gt_labels, 0, c - 1).astype(jnp.int32)
    bbox_scores = jnp.take_along_axis(
        pd_scores[:, None, :, :],  # (B, 1, A, C)
        labels_safe[:, :, None, None],  # (B, M, 1, 1)
        axis=-1,
    )[..., 0]  # (B, M, A)
    align_metric = bbox_scores**alpha * overlaps**beta

    # --- positive-candidate mask (get_pos_mask, loss.py:196-212) ----------
    mask_in_gts = candidates_in_gts(anc_points, gt_bboxes, eps).astype(align_metric.dtype)
    mask_topk = topk_membership(align_metric * mask_in_gts, topk, mask_gt)
    mask_pos = mask_topk * mask_in_gts * mask_gt_f[..., None]

    # --- conflict resolution ----------------------------------------------
    target_gt_idx, fg_mask, mask_pos = resolve_multi_gt(mask_pos, overlaps)

    # --- gather targets (get_targets, loss.py:255-260 sans the flat-index
    # reshuffle: take_along_axis does the per-batch gather directly) -------
    target_labels = jnp.take_along_axis(labels_safe, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)  # (B, A, 4)
    target_scores = jax.nn.one_hot(target_labels, c, dtype=pd_scores.dtype)
    target_scores = target_scores * (fg_mask > 0)[..., None]

    # --- TAL score normalization (loss.py:184-189) -------------------------
    align_metric = align_metric * mask_pos
    pos_align = jnp.max(align_metric, axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(align_metric * pos_overlap / (pos_align + eps), axis=-2)[..., None]  # (B, A, 1)
    target_scores = target_scores * norm

    return AssignResult(
        target_labels=target_labels.astype(jnp.int32),
        target_bboxes=target_bboxes,
        target_scores=target_scores,
        fg_mask=fg_mask > 0,
        target_gt_idx=target_gt_idx,
    )
