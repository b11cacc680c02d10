"""Config system tests (config.py) + tool-script smoke checks."""
import json
import subprocess
import sys

import pytest

from transparent_object_detection_tpu.config import (
    ModelConfig,
    PredictConfig,
    TrainConfig,
    load_config,
)


def test_model_config_derived():
    mc = ModelConfig(phi="s", input_shape=(640, 640))
    assert mc.base_channels == 128 and mc.base_depth == 2 and mc.deep_mul == 0.5
    assert mc.strides == (8, 16, 32)
    assert mc.feat_shapes == ((80, 80), (40, 40), (20, 20))
    assert mc.num_anchors == 8400


def test_model_config_invalid_phi():
    with pytest.raises(ValueError):
        _ = ModelConfig(phi="z").scale


def test_load_config_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model:\n  phi: m\n  input_shape: [320, 320]\n"
        "train:\n  unfreeze_epoch: 10\n  optimizer_type: adam\n"
        "predict:\n  confidence: 0.3\n"
    )
    mc, tc, pc = load_config(str(p))
    assert mc.phi == "m" and mc.input_shape == (320, 320)
    assert tc.unfreeze_epoch == 10 and tc.optimizer_type == "adam"
    assert pc.confidence == 0.3


def test_load_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"train": {"nonexistent_knob": 1}}))
    with pytest.raises(ValueError, match="nonexistent_knob"):
        load_config(str(p))


def test_default_config_file_loads():
    mc, tc, pc = load_config("configs/default.yaml")
    assert mc.phi == "s"
    assert tc.freeze_epoch == 50
    assert pc.nms_mode == "exact"


@pytest.mark.parametrize(
    "script", ["tools/train.py", "tools/predict.py", "tools/summary.py",
               "tools/coco_annotation.py", "tools/get_map.py", "tools/yolo_import.py"]
)
def test_tool_help(script):
    out = subprocess.run(
        [sys.executable, script, "--help"], capture_output=True, text=True, timeout=60
    )
    assert out.returncode == 0, out.stderr
