"""Model-graph tests: backbone/neck/head shapes and the decoded eval output.

Uses a tiny custom scale (base_channels=16, depth=1) so CPU tests stay fast;
shape relations are scale-invariant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.models import FocusModel
from transparent_object_detection_tpu.models.backbone import Backbone
from transparent_object_detection_tpu.models.neck import Neck, upsample2x_nearest

DT = jnp.float32


def tiny_model(num_classes=1):
    return FocusModel(
        num_classes=num_classes,
        base_channels=16,
        base_depth=1,
        deep_mul=0.5,
        num_heads=4,
        dtype=DT,
    )


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = upsample2x_nearest(x)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(
        np.asarray(up[0, :, :, 0]),
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )


def test_backbone_pyramid_shapes():
    bb = Backbone(base_channels=16, base_depth=1, deep_mul=0.5, dtype=DT)
    x = jnp.zeros((1, 128, 128, 3), dtype=DT)
    variables = bb.init(jax.random.key(0), x, train=True)
    f1, f2, f3 = bb.apply(variables, x, train=False)
    assert f1.shape == (1, 16, 16, 64)   # /8, 4c
    assert f2.shape == (1, 8, 8, 128)    # /16, 8c
    assert f3.shape == (1, 4, 4, 128)    # /32, 16c*0.5


def test_neck_shapes():
    neck = Neck(base_channels=16, base_depth=1, deep_mul=0.5, num_heads=4, dtype=DT)
    feats = (
        jnp.zeros((1, 16, 16, 64), DT),
        jnp.zeros((1, 8, 8, 128), DT),
        jnp.zeros((1, 4, 4, 128), DT),
    )
    variables = neck.init(jax.random.key(0), feats, train=True)
    p3, p4, p5 = neck.apply(variables, feats, train=False)
    assert p3.shape == (1, 16, 16, 64)
    assert p4.shape == (1, 8, 8, 128)
    assert p5.shape == (1, 4, 4, 128)


def test_model_train_outputs():
    model = tiny_model(num_classes=3)
    x = jnp.zeros((2, 128, 128, 3), dtype=DT)
    variables = model.init(jax.random.key(0), x, train=True)
    out = model.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    raw = out["raw"]
    assert len(raw) == 3
    no = 4 * 16 + 3  # 4*reg_max + nc
    assert raw[0].shape == (2, 16, 16, no)
    assert raw[1].shape == (2, 8, 8, no)
    assert raw[2].shape == (2, 4, 4, no)
    assert "decoded" not in out


def test_model_eval_decode():
    model = tiny_model(num_classes=2)
    x = jnp.zeros((1, 128, 128, 3), dtype=DT)
    variables = model.init(jax.random.key(0), x, train=True)
    out = model.apply(variables, x, train=False)
    decoded = out["decoded"]
    n_anchors = 16 * 16 + 8 * 8 + 4 * 4
    assert decoded.shape == (1, n_anchors, 4 + 2)
    d = np.asarray(decoded)
    # class scores are probabilities
    assert np.all(d[..., 4:] >= 0) and np.all(d[..., 4:] <= 1)
    # box centers lie inside the input canvas (decode multiplies by stride)
    assert np.all(d[..., 0] >= -128) and np.all(d[..., 0] <= 256)


def test_cls_bias_prior():
    model = tiny_model(num_classes=1)
    # log(5/nc/(640/8)^2) for stride 8
    import math

    head = model  # bias fn lives on Head; check via init params
    x = jnp.zeros((1, 64, 64, 3), dtype=DT)
    variables = model.init(jax.random.key(0), x, train=True)
    b = variables["params"]["head"]["cls0"]["out"]["bias"]
    expected = math.log(5 / 1 / (640 / 8) ** 2)
    np.testing.assert_allclose(np.asarray(b), expected, rtol=1e-6)
    b2 = variables["params"]["head"]["box0"]["out"]["bias"]
    np.testing.assert_allclose(np.asarray(b2), 1.0)


def test_decode_golden_center():
    """With zeroed DFL logits the expected distance is 7.5 grid units on all
    sides -> box center == anchor center * stride, w = h = 15 * stride."""
    model = tiny_model(num_classes=1)
    x = jnp.zeros((1, 64, 64, 3), dtype=DT)
    variables = model.init(jax.random.key(0), x, train=True)

    # Zero all params of the head towers' final convs so box logits are the
    # bias: box bias = 1.0 everywhere -> uniform softmax -> expectation 7.5.
    params = variables["params"]

    def zero_out(tree):
        return jax.tree_util.tree_map(jnp.zeros_like, tree)

    head = dict(params["head"])
    for i in range(3):
        tower = dict(head[f"box{i}"])
        out = dict(tower["out"])
        out["kernel"] = jnp.zeros_like(out["kernel"])
        out["bias"] = jnp.ones_like(out["bias"])  # uniform bins
        tower["out"] = out
        head[f"box{i}"] = tower
    params = {**params, "head": head}
    out = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]}, x, train=False
    )
    d = np.asarray(out["decoded"][0])
    # First anchor of the stride-8 level is at (0.5, 0.5): center 4px, wh 120px.
    np.testing.assert_allclose(d[0, :4], [0.5 * 8, 0.5 * 8, 15 * 8, 15 * 8], atol=1e-3)
