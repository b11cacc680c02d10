"""Tests for the YOLOv8 -> FOCUS weight converter (tools/yolo_import.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from yolo_import import convert_yolov8_state_dict  # noqa: E402


def test_convert_conv_and_bn():
    sd = {
        "model.0.conv.weight": np.zeros((16, 3, 3, 3), np.float32),  # OIHW
        "model.0.bn.weight": np.full(16, 2.0, np.float32),
        "model.0.bn.bias": np.full(16, 3.0, np.float32),
        "model.0.bn.running_mean": np.zeros(16, np.float32),
        "model.0.bn.running_var": np.ones(16, np.float32),
        "model.0.bn.num_batches_tracked": np.asarray(5),
        "model.22.something": np.zeros(4),  # head: ignored
    }
    params, stats = convert_yolov8_state_dict(sd)
    assert params["backbone"]["stem"]["conv"]["kernel"].shape == (3, 3, 3, 16)  # HWIO
    np.testing.assert_allclose(params["backbone"]["stem"]["bn"]["scale"], 2.0)
    np.testing.assert_allclose(stats["backbone"]["stem"]["bn"]["mean"], 0.0)
    assert "dark2_conv" not in params.get("backbone", {})


def test_convert_c2f_bottlenecks():
    sd = {
        "model.2.cv1.conv.weight": np.zeros((8, 4, 1, 1), np.float32),
        "model.2.m.0.cv1.conv.weight": np.zeros((4, 4, 3, 3), np.float32),
        "model.2.m.1.cv2.bn.weight": np.ones(4, np.float32),
    }
    params, _ = convert_yolov8_state_dict(sd)
    node = params["backbone"]["dark2_c2f"]
    assert node["cv1"]["conv"]["kernel"].shape == (1, 1, 4, 8)
    assert node["m0"]["cv1"]["conv"]["kernel"].shape == (3, 3, 4, 4)
    assert node["m1"]["cv2"]["bn"]["scale"].shape == (4,)


def test_partial_merge_into_real_model():
    """Converted tensors with matching shapes land in the model tree."""
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.models import FocusModel
    from transparent_object_detection_tpu.train.checkpoints import load_weights_partial

    model = FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    stem_shape = variables["params"]["backbone"]["stem"]["conv"]["kernel"].shape  # (3,3,3,8)
    o, i = stem_shape[3], stem_shape[2]
    sd = {"model.0.conv.weight": np.ones((o, i, 3, 3), np.float32)}
    params, stats = convert_yolov8_state_dict(sd)
    merged, loaded, skipped = load_weights_partial(
        variables, {"params": params, "batch_stats": stats}
    )
    assert len(loaded) == 1
    np.testing.assert_allclose(
        np.asarray(merged["params"]["backbone"]["stem"]["conv"]["kernel"]), 1.0
    )
