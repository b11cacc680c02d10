"""End-to-end inference-slice tests: letterbox -> forward -> decode -> NMS."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from transparent_object_detection_tpu.config import ModelConfig, PredictConfig
from transparent_object_detection_tpu.inference import Predictor
from transparent_object_detection_tpu.models import FocusModel


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64), compute_dtype="float32")
    model = FocusModel(
        num_classes=1,
        base_channels=8,
        base_depth=1,
        deep_mul=0.5,
        num_heads=2,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 64, 64, 3), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    pred_cfg = PredictConfig(confidence=0.01, max_detections=10, pre_nms_topk=64)
    return Predictor(model, variables, cfg, pred_cfg)


def test_detect_letterboxed_shapes(tiny_predictor):
    imgs = jnp.zeros((2, 64, 64, 3), dtype=jnp.float32)
    shapes = jnp.asarray([[64, 64], [64, 64]], dtype=jnp.float32)
    dets = tiny_predictor.detect_letterboxed(imgs, shapes)
    assert dets["boxes"].shape == (2, 10, 4)
    assert dets["scores"].shape == (2, 10)
    assert dets["num_detections"].shape == (2,)


def test_detect_raw_batch_runs(tiny_predictor):
    raw = jnp.zeros((2, 100, 80, 3), dtype=jnp.uint8)
    shapes = jnp.asarray([[100, 80], [100, 80]], dtype=jnp.float32)
    dets = tiny_predictor.detect_raw_batch(raw, shapes)
    b = np.asarray(dets["boxes"])
    v = np.asarray(dets["valid"])
    # Valid boxes stay within the original image bounds.
    assert np.all(b[v][:, [0, 2]] >= 0) and np.all(b[v][:, [0, 2]] <= 80)
    assert np.all(b[v][:, [1, 3]] >= 0) and np.all(b[v][:, [1, 3]] <= 100)


def test_predict_image_pil(tiny_predictor):
    img = Image.new("RGB", (120, 90), (30, 60, 90))
    rows = tiny_predictor.predict_image(img)
    assert isinstance(rows, list)
    for r in rows:
        x1, y1, x2, y2 = r["box"]
        assert 0 <= x1 <= 120 and 0 <= y1 <= 90
        assert 0 <= r["score"] <= 1
        assert r["class"] == 0


def test_class_activation_map(tiny_predictor):
    imgs = jnp.zeros((1, 64, 64, 3), dtype=jnp.float32)
    heat = tiny_predictor.class_activation_map(imgs)
    assert heat.shape == (1, 8, 8)
    h = np.asarray(heat)
    assert np.all(h >= 0) and np.all(h <= 1)


def test_predictions_deterministic(tiny_predictor):
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
    shapes = jnp.asarray([[64, 64]], dtype=jnp.float32)
    a = tiny_predictor.detect_letterboxed(imgs, shapes)
    b = tiny_predictor.detect_letterboxed(imgs, shapes)
    np.testing.assert_array_equal(np.asarray(a["boxes"]), np.asarray(b["boxes"]))


def test_predictor_reuses_traced_program(tiny_predictor):
    """Two Predictors with equal static config share ONE jitted program —
    building a fresh Predictor (e.g. every eval epoch) never re-traces."""
    p2 = Predictor(
        tiny_predictor.model,
        tiny_predictor.variables,
        tiny_predictor.model_cfg,
        tiny_predictor.predict_cfg,
    )
    assert p2._detect is tiny_predictor._detect
    assert p2._letterbox_detect is tiny_predictor._letterbox_detect
    # a different predict config gets its own program
    p3 = Predictor(
        tiny_predictor.model,
        tiny_predictor.variables,
        tiny_predictor.model_cfg,
        PredictConfig(confidence=0.9, max_detections=5, pre_nms_topk=32),
    )
    assert p3._detect is not tiny_predictor._detect
