"""Tests for the detection criterion (train/loss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.train.loss import LossConfig, detection_loss, sigmoid_bce


def make_raw_maps(key, b=2, nc=1, reg_max=16, shapes=((8, 8), (4, 4), (2, 2)), scale=0.1):
    no = 4 * reg_max + nc
    keys = jax.random.split(key, len(shapes))
    return [
        scale * jax.random.normal(k, (b, h, w, no), dtype=jnp.float32)
        for k, (h, w) in zip(keys, shapes)
    ]


CFG = LossConfig(num_classes=1, strides=(8, 16, 32))


def center_target(b=2, m=8):
    """One GT per image: centered box, half the canvas."""
    boxes = jnp.zeros((b, m, 4))
    boxes = boxes.at[:, 0].set(jnp.array([0.5, 0.5, 0.5, 0.5]))
    labels = jnp.zeros((b, m), dtype=jnp.int32)
    return boxes, labels


def test_loss_runs_and_is_finite():
    raw = make_raw_maps(jax.random.key(0))
    boxes, labels = center_target()
    total, comps = detection_loss(raw, boxes, labels, CFG)
    assert np.isfinite(float(total))
    for k in ("loss_iou", "loss_cls", "loss_dfl"):
        assert np.isfinite(float(comps[k])), k
    assert float(comps["num_fg"]) > 0


def test_loss_zero_gt_only_cls_term():
    raw = make_raw_maps(jax.random.key(1))
    boxes = jnp.zeros((2, 8, 4))
    labels = jnp.zeros((2, 8), dtype=jnp.int32)
    total, comps = detection_loss(raw, boxes, labels, CFG)
    assert float(comps["loss_iou"]) == 0.0
    assert float(comps["loss_dfl"]) == 0.0
    assert float(comps["num_fg"]) == 0.0
    # cls term = sum BCE / max(sum target_scores, 1) = sum BCE
    assert float(comps["loss_cls"]) > 0.0
    assert np.isfinite(float(total))


def test_loss_weights_applied():
    raw = make_raw_maps(jax.random.key(2))
    boxes, labels = center_target()
    total, comps = detection_loss(raw, boxes, labels, CFG)
    expect = 7.5 * float(comps["loss_iou"]) + 0.5 * float(comps["loss_cls"]) + 1.5 * float(
        comps["loss_dfl"]
    )
    assert float(total) == pytest.approx(expect, rel=1e-5)


def test_loss_gradients_finite():
    raw = make_raw_maps(jax.random.key(3), b=1)
    boxes, labels = center_target(b=1)

    def f(maps):
        return detection_loss(maps, boxes, labels, CFG)[0]

    grads = jax.grad(f)(raw)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0  # gradient actually flows


def test_loss_better_predictions_lower_loss():
    """Crafted near-perfect predictions must beat random ones."""
    b, reg_max, nc = 1, 16, 1
    shapes = ((8, 8), (4, 4), (2, 2))
    boxes, labels = center_target(b=1)
    # GT in pixels on 64x64 canvas: center (32, 32), wh (32, 32) -> xyxy 16..48.
    # Build raw maps whose DFL logits put the correct distance at each anchor
    # of level 0 (stride 8) and high cls score inside the GT.
    raws = []
    for (h, w), s in zip(shapes, (8, 16, 32)):
        no = 4 * reg_max + nc
        m = np.zeros((b, h, w, no), dtype=np.float32)
        ys, xs = np.mgrid[0:h, 0:w]
        ax, ay = (xs + 0.5), (ys + 0.5)  # grid units
        # distances to GT edges in grid units, clipped into bin range
        l = np.clip(ax - 16.0 / s, 0, reg_max - 1.01)
        t = np.clip(ay - 16.0 / s, 0, reg_max - 1.01)
        r = np.clip(48.0 / s - ax, 0, reg_max - 1.01)
        bt = np.clip(48.0 / s - ay, 0, reg_max - 1.01)
        for i, d in enumerate((l, t, r, bt)):
            bin_idx = np.round(d).astype(int)
            onehot = np.zeros((h, w, reg_max), dtype=np.float32)
            np.put_along_axis(onehot, bin_idx[..., None], 12.0, axis=-1)
            m[0, :, :, i * reg_max : (i + 1) * reg_max] = onehot
        inside = (ax * s > 16) & (ax * s < 48) & (ay * s > 16) & (ay * s < 48)
        m[0, :, :, 4 * reg_max] = np.where(inside, 6.0, -6.0)
        raws.append(jnp.asarray(m))

    good, _ = detection_loss(raws, boxes, labels, CFG)
    bad, _ = detection_loss(make_raw_maps(jax.random.key(4), b=1), boxes, labels, CFG)
    assert float(good) < float(bad)


def test_sigmoid_bce_golden():
    logits = jnp.array([0.0, 2.0, -2.0])
    targets = jnp.array([0.5, 1.0, 0.0])
    want = -(targets * np.log(1 / (1 + np.exp(-np.asarray(logits))))
             + (1 - targets) * np.log(1 - 1 / (1 + np.exp(-np.asarray(logits)))))
    np.testing.assert_allclose(np.asarray(sigmoid_bce(logits, targets)), want, rtol=1e-5)


def test_label_smoothing_changes_cls_only():
    raw = make_raw_maps(jax.random.key(5))
    boxes, labels = center_target()
    _, base = detection_loss(raw, boxes, labels, CFG)
    _, smooth = detection_loss(
        raw, boxes, labels, CFG._replace(label_smoothing=0.1)
    )
    assert float(base["loss_iou"]) == pytest.approx(float(smooth["loss_iou"]))
    assert float(base["loss_cls"]) != pytest.approx(float(smooth["loss_cls"]))
