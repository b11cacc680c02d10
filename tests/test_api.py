"""FOCUS object-API tests (api.py): construction, predict dispatch, fps,
heatmap, summary, weights roundtrip, export."""
import os

import numpy as np
import pytest
from PIL import Image

from transparent_object_detection_tpu.api import FOCUS
from transparent_object_detection_tpu.config import SCALE_TABLE, ModelConfig, PredictConfig


@pytest.fixture(scope="module")
def focus(tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    classes = root / "classes.txt"
    classes.write_text("Transparent\n")
    # tiny custom model via monkey construction: use phi 'n' but shrink input
    f = FOCUS.__new__(FOCUS)
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.models import FocusModel

    f.class_names, f.num_classes = ["Transparent"], 1
    f.model_cfg = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    f.predict_cfg = PredictConfig(confidence=0.01, max_detections=8, pre_nms_topk=64)
    f.seed = 11
    f.model = FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    f.variables = f.model.init(jax.random.key(0), x, train=True)
    f._predictor = None
    return f


def test_scale_table_complete():
    assert set(SCALE_TABLE) == {"n", "s", "m", "l", "x"}
    assert SCALE_TABLE["s"] == (128, 2, 0.5)
    assert SCALE_TABLE["x"] == (1024, 5, 1.25)


def test_detect_image_and_draw(focus):
    img = Image.new("RGB", (100, 80), (20, 120, 220))
    rows, drawn = focus.detect_image(img, draw=True)
    assert isinstance(rows, list)
    assert drawn.size == img.size


def test_predict_dispatch_image(focus, tmp_path):
    p = tmp_path / "x.png"
    Image.new("RGB", (50, 50)).save(p)
    rows = focus.predict(str(p))
    assert isinstance(rows, list)


def test_predict_dir(focus, tmp_path):
    din = tmp_path / "in"
    dout = tmp_path / "out"
    din.mkdir()
    for i in range(2):
        Image.new("RGB", (40, 40), (i * 100, 0, 0)).save(din / f"{i}.png")
    res = focus.predict_dir(str(din), str(dout))
    assert len(res) == 2
    assert len(os.listdir(dout)) == 2


def test_get_fps(focus):
    sec = focus.get_fps(test_interval=3)
    assert sec > 0


def test_heatmap(focus, tmp_path):
    heat = focus.detect_heatmap(Image.new("RGB", (64, 64)), str(tmp_path / "h.png"))
    assert heat.shape == (8, 8)
    assert os.path.exists(tmp_path / "h.png")


def test_summary(focus):
    out = focus.summary()
    assert out["params"] > 1000
    assert out["flops"] > 0


def test_weights_roundtrip(focus, tmp_path):
    import jax

    p = focus.save_weights(str(tmp_path / "w"))
    # perturb then reload
    orig = focus.variables
    focus.variables = jax.tree_util.tree_map(lambda x: x * 0, orig)
    focus.load_weights(p)
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        focus.variables["params"],
        orig["params"],
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_fuse_preserves_predictions(focus):
    img = Image.new("RGB", (64, 64), (100, 150, 200))
    before = focus.detect_image(img)
    import copy

    fused = copy.copy(focus)
    fused._predictor = None
    fused.fuse()
    after = fused.detect_image(img)
    assert len(before) == len(after)
    for b, a in zip(before, after):
        np.testing.assert_allclose(b["box"], a["box"], atol=0.5)
        assert b["score"] == pytest.approx(a["score"], abs=1e-3)


def test_export_stablehlo_roundtrip(focus, tmp_path):
    """The serialized artifact must round-trip: deserialize from the bytes
    on disk and CALL it, matching the live model's decode output (the
    ONNX-consumer analog of reference model.py:316-324)."""
    import jax.numpy as jnp
    from jax import export as jexport

    p = focus.export(str(tmp_path / "m.stablehlo"))
    assert os.path.getsize(p) > 1000

    with open(p, "rb") as f:
        exp = jexport.deserialize(f.read())
    h, w = focus.model_cfg.input_shape
    img = jnp.asarray(
        np.random.default_rng(3).random((1, h, w, 3)), jnp.float32
    )
    out = exp.call(img)
    direct = focus.model.apply(focus.variables, img, train=False)["decoded"]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(direct, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_focus_train_and_evaluate(focus, tmp_path):
    """FOCUS.train end-to-end on the tiny model + standalone evaluate."""
    from transparent_object_detection_tpu.config import TrainConfig

    rng = np.random.default_rng(5)
    lines = []
    for i in range(4):
        arr = np.full((80, 80, 3), 230, dtype=np.uint8)
        arr[20:60, 25:65] = (200, 40, 40)
        p = str(tmp_path / f"tr{i}.png")
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 25,20,65,60,0")

    tc = TrainConfig(
        init_epoch=0, freeze_epoch=0, unfreeze_epoch=1, freeze_train=False,
        freeze_batch_size=2, unfreeze_batch_size=2, optimizer_type="adam",
        mosaic=False, mixup=False, max_boxes=8, num_workers=1,
        save_dir=str(tmp_path / "logs"), eval_period=100, eval_flag=False,
    )
    hist = focus.train(
        train_lines=lines, val_lines=lines, train_cfg=tc,
        save_dir=str(tmp_path / "logs"),
    )
    assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    stats = focus.evaluate(lines, batch_size=2)
    assert "AP50" in stats and "voc_map" in stats


def test_int8_serving_same_checkpoint(focus):
    """FOCUS(int8=True) analog: the int8 serving model accepts the SAME
    variables tree as the bf16 model and produces detections; api.py strips
    int8 from the training config (round() has zero gradient)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.inference import Predictor
    from transparent_object_detection_tpu.models import FocusModel

    q_model = FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32, int8_dense=True, int8_attn=True,
    )
    # identical parameter tree: bf16-trained weights deploy unchanged
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    q_vars = q_model.init(jax.random.key(0), x, train=True)
    assert jax.tree_util.tree_structure(q_vars) == jax.tree_util.tree_structure(
        focus.variables
    )
    pred = Predictor(q_model, focus.variables, focus.model_cfg, focus.predict_cfg)
    img = Image.fromarray(np.full((48, 64, 3), 128, np.uint8))
    rows = pred.predict_image(img)
    assert isinstance(rows, list)

    # the FOCUS.train guard builds a de-quantized model config
    cfg = dataclasses.replace(focus.model_cfg, int8_dense=True, int8_attn=True)
    stripped = dataclasses.replace(cfg, int8_dense=False, int8_attn=False)
    assert not (stripped.int8_dense or stripped.int8_attn)
