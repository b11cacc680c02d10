"""Exact-resume, VOC results reporting, and video-prediction tests."""
import os

import numpy as np
import pytest
from PIL import Image


def test_write_results(tmp_path):
    from transparent_object_detection_tpu.eval.voc_map import voc_map, write_results

    d = [np.asarray([[10, 10, 50, 50, 0.9, 0]], np.float64)]
    g = [np.asarray([[10, 10, 50, 50, 0]], np.float64)]
    m, per = voc_map(d, g, 1)
    path = write_results(str(tmp_path), m, per, ["Transparent"])
    text = open(path).read()
    assert "mAP@0.5: 100.00%" in text
    assert "Transparent: AP=100.00%" in text
    assert os.path.exists(tmp_path / "pr_Transparent.png")


def test_cartucho_dir_roundtrip(tmp_path):
    from transparent_object_detection_tpu.eval.voc_map import get_map_from_dirs

    gt = tmp_path / "ground-truth"
    dr = tmp_path / "detection-results"
    gt.mkdir()
    dr.mkdir()
    (gt / "img1.txt").write_text("Transparent 10 10 50 50\nTransparent 80 80 120 120 difficult\n")
    (dr / "img1.txt").write_text("Transparent 0.95 11 11 51 51\n")
    m, per = get_map_from_dirs(str(gt), str(dr), ["Transparent"])
    assert m == pytest.approx(1.0)
    assert per[0].num_gt == 1  # difficult excluded


def test_trainer_exact_resume(tmp_path):
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
    from transparent_object_detection_tpu.models import FocusModel
    from transparent_object_detection_tpu.train.checkpoints import CheckpointManager
    from transparent_object_detection_tpu.train.optimizer import build_optimizer
    from transparent_object_detection_tpu.train.trainer import TrainState, create_train_state

    model = FocusModel(num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5,
                       num_heads=2, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    tc = TrainConfig(optimizer_type="sgd")
    tx = build_optimizer(tc, variables["params"])
    state = create_train_state(model, variables, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          ema_updates=jnp.asarray(7, jnp.int32))

    cm = CheckpointManager(str(tmp_path))
    cm.save_epoch(state, epoch=1, is_best=True, period=0)

    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "ema_updates": state.ema_updates,
        "step": state.step,
    }
    restored = cm.restore_like("last_state", template)
    assert int(restored["step"]) == 7
    assert int(restored["ema_updates"]) == 7
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        restored["params"], state.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    # optimizer state round-trips with structure intact
    rs = TrainState(**restored)
    assert jax.tree_util.tree_structure(rs.opt_state) == jax.tree_util.tree_structure(
        state.opt_state
    )


def test_predict_video(tmp_path):
    import cv2

    from transparent_object_detection_tpu.config import ModelConfig, PredictConfig
    from transparent_object_detection_tpu.api import FOCUS
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.models import FocusModel

    # build tiny FOCUS without __init__ (same pattern as test_api)
    f = FOCUS.__new__(FOCUS)
    f.class_names, f.num_classes = ["Transparent"], 1
    f.model_cfg = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    f.predict_cfg = PredictConfig(confidence=0.01, max_detections=5, pre_nms_topk=32)
    f.seed = 11
    f.model = FocusModel(num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5,
                         num_heads=2, dtype=jnp.float32)
    f.variables = f.model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    f._predictor = None

    src = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (80, 60))
    for i in range(4):
        w.write(np.full((60, 80, 3), i * 40, np.uint8))
    w.release()

    fps = f.predict_video(src, out, max_frames=3)
    assert fps > 0
    assert os.path.getsize(out) > 0


def test_eval_callback_writes_cartucho_dirs(tmp_path):
    from transparent_object_detection_tpu.config import ModelConfig
    from transparent_object_detection_tpu.eval.callbacks import EvalCallback
    from transparent_object_detection_tpu.eval.voc_map import get_map_from_dirs

    cb = EvalCallback(
        ModelConfig(num_classes=1, input_shape=(64, 64)), [], ["Transparent"],
        log_dir=str(tmp_path),
    )
    dets = [np.asarray([[10, 10, 50, 50, 0.9, 0]], np.float64)]
    gts = [np.asarray([[10, 10, 50, 50, 0]], np.float64)]
    cb.write_cartucho_dirs(dets, gts, str(tmp_path / "out"))
    m, _ = get_map_from_dirs(
        str(tmp_path / "out" / "ground-truth"),
        str(tmp_path / "out" / "detection-results"),
        ["Transparent"],
    )
    assert m == pytest.approx(1.0)
