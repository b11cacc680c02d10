"""Golden-value and property tests for ops.geometry.

Hand-computed cases mirror the reference semantics of model/loss.py:59-138
and utils/bbox_utils.py:14-58.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.ops import (
    bbox2dist,
    bbox_iou,
    dist2bbox,
    make_anchors,
    pairwise_iou,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_xyxy_roundtrip(rng):
    xywh = np.abs(rng.normal(size=(7, 3, 4))).astype(np.float32) + 0.1
    out = xyxy2xywh(xywh2xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(out), xywh, rtol=1e-5, atol=1e-5)


def test_xywh2xyxy_golden():
    box = jnp.array([10.0, 20.0, 4.0, 6.0])
    np.testing.assert_allclose(np.asarray(xywh2xyxy(box)), [8.0, 17.0, 12.0, 23.0])


def test_iou_golden_identical():
    b = jnp.array([0.0, 0.0, 10.0, 10.0])
    assert float(bbox_iou(b, b, xywh=False)) == pytest.approx(1.0, abs=1e-5)


def test_iou_golden_half_overlap():
    # [0,0,10,10] vs [5,0,15,10]: inter 50, union 150
    b1 = jnp.array([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.array([5.0, 0.0, 15.0, 10.0])
    assert float(bbox_iou(b1, b2, xywh=False)) == pytest.approx(1 / 3, abs=1e-4)


def test_iou_disjoint_zero():
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0])
    b2 = jnp.array([5.0, 5.0, 6.0, 6.0])
    assert float(bbox_iou(b1, b2, xywh=False)) == pytest.approx(0.0, abs=1e-6)


def test_ciou_le_diou_le_iou():
    b1 = jnp.array([0.0, 0.0, 10.0, 8.0])
    b2 = jnp.array([3.0, 2.0, 12.0, 14.0])
    iou = float(bbox_iou(b1, b2, xywh=False, kind="iou"))
    diou = float(bbox_iou(b1, b2, xywh=False, kind="diou"))
    ciou = float(bbox_iou(b1, b2, xywh=False, kind="ciou"))
    giou = float(bbox_iou(b1, b2, xywh=False, kind="giou"))
    assert ciou <= diou <= iou
    assert giou <= iou


def test_ciou_equals_diou_same_aspect():
    # identical aspect ratios -> v = 0 -> CIoU == DIoU
    b1 = jnp.array([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.array([2.0, 2.0, 8.0, 8.0])
    d = float(bbox_iou(b1, b2, xywh=False, kind="diou"))
    c = float(bbox_iou(b1, b2, xywh=False, kind="ciou"))
    assert c == pytest.approx(d, abs=1e-6)


def test_pairwise_iou_shape_and_symmetry(rng):
    a = np.sort(rng.uniform(0, 100, size=(5, 2, 2)), axis=-1)
    boxes = jnp.asarray(a.transpose(0, 2, 1).reshape(5, 4))  # x1,y1,x2,y2? build valid boxes
    x1 = jnp.minimum(boxes[:, 0], boxes[:, 2])
    x2 = jnp.maximum(boxes[:, 0], boxes[:, 2])
    y1 = jnp.minimum(boxes[:, 1], boxes[:, 3])
    y2 = jnp.maximum(boxes[:, 1], boxes[:, 3])
    boxes = jnp.stack([x1, y1, x2, y2], -1)
    m = pairwise_iou(boxes, boxes)
    assert m.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m).T, atol=1e-5)
    np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-4)


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.array([[10.0, 10.0], [30.5, 20.5]])
    ltrb = jnp.array([[2.0, 3.0, 4.0, 5.0], [1.0, 1.5, 2.0, 2.5]])
    xyxy = dist2bbox(ltrb, anchors, xywh=False)
    np.testing.assert_allclose(np.asarray(xyxy[0]), [8.0, 7.0, 14.0, 15.0])
    back = bbox2dist(anchors, xyxy, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ltrb), atol=1e-5)


def test_bbox2dist_clips_to_regmax():
    anchors = jnp.array([[0.0, 0.0]])
    bbox = jnp.array([[-100.0, -100.0, 100.0, 100.0]])
    d = bbox2dist(anchors, bbox, reg_max=16)
    assert float(jnp.max(d)) == pytest.approx(15.99, abs=1e-5)


def test_dist2bbox_xywh():
    anchors = jnp.array([[10.0, 10.0]])
    ltrb = jnp.array([[2.0, 2.0, 4.0, 4.0]])
    xywh = dist2bbox(ltrb, anchors, xywh=True)
    np.testing.assert_allclose(np.asarray(xywh[0]), [11.0, 11.0, 6.0, 6.0])


def test_make_anchors_golden():
    pts, strides = make_anchors(((2, 3), (1, 1)), (8, 16), 0.5)
    assert pts.shape == (7, 2) and strides.shape == (7, 1)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # x varies fastest
    np.testing.assert_allclose(np.asarray(pts[3]), [0.5, 1.5])
    np.testing.assert_allclose(np.asarray(pts[6]), [0.5, 0.5])
    assert float(strides[0, 0]) == 8 and float(strides[6, 0]) == 16


def test_make_anchors_640():
    shapes = ((80, 80), (40, 40), (20, 20))
    pts, strides = make_anchors(shapes, (8, 16, 32))
    assert pts.shape == (8400, 2)
    assert float(strides[0, 0]) == 8 and float(strides[-1, 0]) == 32
