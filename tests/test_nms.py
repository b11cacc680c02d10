"""Tests for the on-device batched NMS (ops/nms.py).

Golden cases verified against the greedy torchvision.ops.nms semantics the
reference relies on (utils/bbox_utils.py:170-175): sorted-by-score greedy
suppression, per-class separation.
"""
import jax.numpy as jnp
import numpy as np

from transparent_object_detection_tpu.ops import batched_nms


def _single(boxes, scores_1c, **kw):
    """Run NMS on one image, one class."""
    b = jnp.asarray(boxes, dtype=jnp.float32)[None]
    s = jnp.asarray(scores_1c, dtype=jnp.float32)[None, :, None]
    return batched_nms(b, s, **kw)


def reference_greedy_nms(boxes, scores, iou_thres):
    """Host-side greedy NMS oracle (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter + 1e-7) > iou_thres:
                suppressed[j] = True
    return keep


def test_nms_suppresses_overlap():
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]
    scores = [0.9, 0.8, 0.7]
    out = _single(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_detections=10)
    assert int(out["num_detections"][0]) == 2
    kept = np.asarray(out["boxes"][0][out["valid"][0]])
    np.testing.assert_allclose(kept[0], [0, 0, 10, 10])
    np.testing.assert_allclose(kept[1], [50, 50, 60, 60])


def test_nms_conf_threshold():
    boxes = [[0, 0, 10, 10], [50, 50, 60, 60]]
    scores = [0.9, 0.2]
    out = _single(boxes, scores, conf_thres=0.5, iou_thres=0.5, max_detections=10)
    assert int(out["num_detections"][0]) == 1
    assert float(out["scores"][0, 0]) == np.float32(0.9)


def test_nms_classes_independent():
    # Same location, different argmax class: both survive class-aware NMS.
    boxes = jnp.asarray([[[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5]]], dtype=jnp.float32)
    scores = jnp.asarray([[[0.9, 0.05], [0.1, 0.8]]], dtype=jnp.float32)
    out = batched_nms(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_detections=10)
    assert int(out["num_detections"][0]) == 2
    # class-agnostic collapses them
    out2 = batched_nms(
        boxes, scores, conf_thres=0.1, iou_thres=0.5, max_detections=10, class_agnostic=True
    )
    assert int(out2["num_detections"][0]) == 1


def test_nms_exact_matches_oracle(rng):
    n = 60
    centers = rng.uniform(10, 90, size=(n, 2))
    wh = rng.uniform(5, 25, size=(n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    out = _single(boxes, scores, conf_thres=0.0, iou_thres=0.45, max_detections=n, mode="exact")
    keep_ref = reference_greedy_nms(boxes, scores, 0.45)
    got_scores = np.sort(np.asarray(out["scores"][0][np.asarray(out["valid"][0])]))
    want_scores = np.sort(scores[keep_ref])
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)


def test_nms_greedy_revival_case():
    # B suppressed by A; C overlaps B but not A -> torchvision keeps C.
    boxes = [[0, 0, 10, 10], [4, 0, 14, 10], [9, 0, 19, 10]]
    scores = [0.9, 0.8, 0.7]
    out = _single(boxes, scores, conf_thres=0.0, iou_thres=0.3, max_detections=5, mode="exact")
    assert int(out["num_detections"][0]) == 2  # A and C
    kept = np.asarray(out["boxes"][0][np.asarray(out["valid"][0])])
    np.testing.assert_allclose(kept[1], [9, 0, 19, 10])
    # fast mode is more aggressive here (C dies to already-dead B)
    out_fast = _single(boxes, scores, conf_thres=0.0, iou_thres=0.3, max_detections=5, mode="fast")
    assert int(out_fast["num_detections"][0]) == 1


def test_nms_fixed_shapes_and_empty():
    boxes = jnp.zeros((2, 100, 4), dtype=jnp.float32)
    scores = jnp.zeros((2, 100, 3), dtype=jnp.float32)
    out = batched_nms(boxes, scores, conf_thres=0.5, max_detections=20)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["scores"].shape == (2, 20)
    assert out["classes"].shape == (2, 20)
    assert int(out["num_detections"].sum()) == 0


def test_nms_max_detections_cap(rng):
    n = 50
    # Disjoint boxes on a line: nothing suppressed, cap applies.
    xs = np.arange(n, dtype=np.float32) * 20
    boxes = np.stack([xs, np.zeros(n), xs + 10, np.full(n, 10.0)], axis=1)
    scores = rng.uniform(0.5, 1.0, size=(n,)).astype(np.float32)
    out = _single(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_detections=8)
    assert int(out["num_detections"][0]) == 8
    s = np.asarray(out["scores"][0])
    assert np.all(np.diff(s) <= 1e-6)  # sorted desc
