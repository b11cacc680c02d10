"""Golden-value tests for the task-aligned assigner (train/assigner.py).

Hand-worked tiny cases mirroring the semantics of reference
model/loss.py:140-260.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.train.assigner import (
    candidates_in_gts,
    resolve_multi_gt,
    task_aligned_assign,
    topk_membership,
)

ANCHORS_2X2 = jnp.array([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]])


def test_candidates_in_gts():
    gts = jnp.array([[[0.0, 0.0, 1.0, 2.0], [0.0, 0.0, 0.0, 0.0]]])  # left column
    mask = candidates_in_gts(ANCHORS_2X2, gts)
    np.testing.assert_array_equal(
        np.asarray(mask[0, 0]), [True, False, True, False]
    )
    assert not np.any(np.asarray(mask[0, 1]))  # degenerate box contains nothing


def test_topk_membership_basic():
    metrics = jnp.array([[[0.9, 0.1, 0.5, 0.3]]])  # (1, 1, 4)
    out = topk_membership(metrics, topk=2, topk_mask=jnp.array([[True]]))
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [1, 0, 1, 0])


def test_topk_membership_masked_gt_goes_dark():
    metrics = jnp.array([[[0.9, 0.1, 0.5, 0.3]]])
    out = topk_membership(metrics, topk=2, topk_mask=jnp.array([[False]]))
    # all indices collapse to 0 -> count 2 > 1 -> erased
    assert float(out.sum()) == 0.0


def test_resolve_multi_gt_prefers_higher_overlap():
    # Anchor 0 claimed by both GTs; GT1 has higher IoU with it.
    mask_pos = jnp.array([[[1.0, 1.0], [1.0, 0.0]]])  # (B=1, M=2, A=2)
    overlaps = jnp.array([[[0.3, 0.9], [0.8, 0.0]]])
    tgt_idx, fg, mp = resolve_multi_gt(mask_pos, overlaps)
    assert int(tgt_idx[0, 0]) == 1  # anchor 0 -> GT 1 (overlap .8 > .3)
    assert int(tgt_idx[0, 1]) == 0
    np.testing.assert_array_equal(np.asarray(fg[0]), [1.0, 1.0])


def _simple_assign(scores, nc=2):
    """One GT covering the full 2x2 grid, predictions == GT box."""
    gt = jnp.array([[[0.0, 0.0, 2.0, 2.0], [0.0, 0.0, 0.0, 0.0]]])
    labels = jnp.array([[0, 0]], dtype=jnp.int32)
    mask = jnp.array([[True, False]])
    pd_boxes = jnp.tile(gt[:, 0:1], (1, 4, 1))  # every anchor predicts the GT box
    pd_scores = jnp.zeros((1, 4, nc)).at[..., 0].set(jnp.asarray(scores))
    return task_aligned_assign(
        pd_scores, pd_boxes, ANCHORS_2X2, labels, gt, mask, num_classes=nc
    )


def test_assign_all_anchors_inside_single_gt():
    res = _simple_assign([0.9, 0.8, 0.1, 0.2])
    assert np.all(np.asarray(res.fg_mask[0]))
    np.testing.assert_array_equal(np.asarray(res.target_labels[0]), [0, 0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(res.target_bboxes[0]), np.tile([0, 0, 2, 2], (4, 1)), atol=1e-6
    )
    # normalized target scores: sqrt(s_a) * max_overlap / max_align
    # = sqrt(s_a) / sqrt(0.9) since overlaps are all 1.
    expect = np.sqrt(np.array([0.9, 0.8, 0.1, 0.2]) / 0.9)
    np.testing.assert_allclose(np.asarray(res.target_scores[0, :, 0]), expect, rtol=1e-4)
    # non-GT class channel stays zero
    assert float(res.target_scores[0, :, 1].sum()) == 0.0


def test_assign_no_valid_gt():
    gt = jnp.zeros((1, 2, 4))
    labels = jnp.zeros((1, 2), dtype=jnp.int32)
    mask = jnp.zeros((1, 2), dtype=bool)
    pd_boxes = jnp.tile(jnp.array([0.0, 0.0, 1.0, 1.0]), (1, 4, 1))
    pd_scores = jnp.full((1, 4, 1), 0.5)
    res = task_aligned_assign(
        pd_scores, pd_boxes, ANCHORS_2X2, labels, gt, mask, num_classes=1
    )
    assert not np.any(np.asarray(res.fg_mask))
    assert float(res.target_scores.sum()) == 0.0


def test_assign_two_disjoint_gts():
    # GT0 covers left column, GT1 right column; class differs.
    gt = jnp.array([[[0.0, 0.0, 1.0, 2.0], [1.0, 0.0, 2.0, 2.0]]])
    labels = jnp.array([[0, 1]], dtype=jnp.int32)
    mask = jnp.array([[True, True]])
    pd_boxes = jnp.tile(
        jnp.array([[[0.0, 0.0, 1.0, 2.0], [1.0, 0.0, 2.0, 2.0],
                    [0.0, 0.0, 1.0, 2.0], [1.0, 0.0, 2.0, 2.0]]]), (1, 1, 1)
    )
    pd_scores = jnp.full((1, 4, 2), 0.5)
    res = task_aligned_assign(
        pd_scores, pd_boxes, ANCHORS_2X2, labels, gt, mask, num_classes=2
    )
    np.testing.assert_array_equal(np.asarray(res.target_labels[0]), [0, 1, 0, 1])
    assert np.all(np.asarray(res.fg_mask))


def test_assign_topk_limits_positives():
    """With topk=1 only the best-aligned anchor per GT stays positive."""
    res_full = _simple_assign([0.9, 0.8, 0.1, 0.2])
    gt = jnp.array([[[0.0, 0.0, 2.0, 2.0]]])
    labels = jnp.array([[0]], dtype=jnp.int32)
    mask = jnp.array([[True]])
    pd_boxes = jnp.tile(gt[:, 0:1], (1, 4, 1))
    pd_scores = jnp.zeros((1, 4, 2)).at[..., 0].set(jnp.array([0.9, 0.8, 0.1, 0.2]))
    res_k1 = task_aligned_assign(
        pd_scores, pd_boxes, ANCHORS_2X2, labels, gt, mask, num_classes=2, topk=1
    )
    assert int(res_full.fg_mask.sum()) == 4
    assert int(res_k1.fg_mask.sum()) == 1
    assert bool(res_k1.fg_mask[0, 0])  # highest score anchor
