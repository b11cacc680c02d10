"""Tensor-parallel sharding tests on a 2x4 virtual CPU mesh:
sharded layouts must not change the math (forward and train step)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
from transparent_object_detection_tpu.models import FocusModel
from transparent_object_detection_tpu.parallel.tp import (
    make_2d_mesh,
    shard_params_tp,
    tp_param_spec,
    tp_shardings,
)
from transparent_object_detection_tpu.train.optimizer import build_optimizer
from transparent_object_detection_tpu.train.trainer import (
    create_train_state,
    loss_config_from,
    make_train_step,
)


def tiny_model():
    return FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32,
    )


def test_tp_param_spec_rules():
    leaf2d = np.zeros((4, 8))
    leaf1d = np.zeros((8,))
    assert tp_param_spec(["neck", "h1", "teb", "qkv", "kernel"], leaf2d) == P(None, "model")
    assert tp_param_spec(["neck", "h1", "teb", "qkv", "bias"], leaf1d) == P("model")
    assert tp_param_spec(["neck", "h1", "teb", "mlp1", "kernel"], leaf2d) == P(None, "model")
    assert tp_param_spec(["neck", "h1", "teb", "mlp2", "kernel"], leaf2d) == P("model", None)
    assert tp_param_spec(["neck", "h1", "teb", "mlp2", "bias"], leaf1d) == P()
    assert tp_param_spec(["backbone", "stem", "conv", "kernel"], np.zeros((3, 3, 3, 8))) == P()
    assert tp_param_spec(["head", "cls0", "out", "bias"], leaf1d) == P()


def test_make_2d_mesh():
    mesh = make_2d_mesh(tp=4)
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    with pytest.raises(ValueError):
        make_2d_mesh(tp=3)


def test_tp_forward_matches_single_device():
    model = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)

    ref = model.apply(variables, x, train=False)["decoded"]

    mesh = make_2d_mesh(tp=4)
    sharded_params = shard_params_tp(variables["params"], mesh)
    bs = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), variables["batch_stats"]
    )
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p, s, xx: model.apply({"params": p, "batch_stats": s}, xx, train=False)[
            "decoded"
        ]
    )(sharded_params, bs, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_tp_train_step_matches_single_device():
    mc = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    tc = TrainConfig(max_boxes=4, optimizer_type="sgd", ema=True)
    model = tiny_model()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    tx = build_optimizer(tc, variables["params"])
    lc = loss_config_from(mc, tc)
    step = make_train_step(model, tx, lc, tc, donate=False)

    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.uniform(size=(8, 64, 64, 3)), jnp.float32),
        "boxes": jnp.zeros((8, 4, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "labels": jnp.zeros((8, 4), jnp.int32),
    }
    lr = jnp.asarray(1e-3)

    s_ref, c_ref = step(create_train_state(model, variables, tx), batch, lr)

    mesh = make_2d_mesh(tp=4)
    state = create_train_state(model, variables, tx)
    state = state.replace(params=shard_params_tp(state.params, mesh))
    repl = NamedSharding(mesh, P())
    state = state.replace(
        batch_stats=jax.device_put(state.batch_stats, repl),
        ema_params=jax.device_put(state.ema_params, repl),
        ema_batch_stats=jax.device_put(state.ema_batch_stats, repl),
    )
    batch_sh = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P("data"))), batch
    )
    s_tp, c_tp = step(state, batch_sh, lr)

    assert float(c_ref["loss"]) == pytest.approx(float(c_tp["loss"]), rel=1e-4)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_ref.params, s_tp.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 5e-5


# ---------------------------------------------------------------------------
# TP SERVING (ops/teb_tp.py): Megatron shard_map TEBs through the Predictor
# ---------------------------------------------------------------------------


def _serving_setup(int8: bool):
    from transparent_object_detection_tpu.config import PredictConfig
    from transparent_object_detection_tpu.inference import Predictor

    # base_channels=32 @ 128² exercises BOTH attention routes: the 512-ch
    # h1/h6 TEBs pick 4 heads (divisible by tp=4 -> head-local path) and the
    # 384-ch h2/h4 TEBs pick 3 heads (ragged -> exact all-gather fallback).
    mc = ModelConfig(num_classes=1, input_shape=(128, 128), compute_dtype="float32")
    model = FocusModel(
        num_classes=1, base_channels=32, base_depth=1, deep_mul=0.5,
        num_heads=8, dtype=jnp.float32, int8_dense=int8, int8_attn=int8,
    )
    x1 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x1, train=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (2, 1))
    pc = PredictConfig(confidence=0.01, max_detections=16, pre_nms_topk=64)
    return mc, model, variables, imgs, shapes, pc, Predictor


def test_tp_serving_matches_single_device_fp32():
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh

    mc, model, variables, imgs, shapes, pc, Predictor = _serving_setup(int8=False)
    ref_decoded = model.apply(variables, imgs, train=False)["decoded"]
    p0 = Predictor(model, variables, mc, pc)
    d0 = p0.detect_letterboxed(imgs, shapes)

    mesh = make_2d_mesh(tp=4)
    try:
        pt = Predictor(model, variables, mc, pc, mesh=mesh)
        assert pt.model.tp_serving
        tp_decoded = pt.model.apply(pt.variables, imgs, train=False)["decoded"]
        dt = pt.detect_letterboxed(imgs, shapes)
    finally:
        set_compute_mesh(None)

    scale = float(jnp.abs(ref_decoded).max())
    np.testing.assert_allclose(
        np.asarray(tp_decoded), np.asarray(ref_decoded),
        atol=1e-4 * scale, rtol=1e-4,
    )
    # the full serving program (decode + NMS) agrees detection-for-detection
    np.testing.assert_array_equal(
        np.asarray(d0["num_detections"]), np.asarray(dt["num_detections"])
    )
    np.testing.assert_allclose(
        np.asarray(d0["boxes"]), np.asarray(dt["boxes"]), atol=1e-3
    )


def test_tp_serving_int8_runs_and_stays_close():
    """int8 TP serving is NOT bitwise against single-device int8 (the
    row-parallel matmuls quantize per-rank K-slices), but it must stay in
    the same quantization-noise class."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh

    mc, model, variables, imgs, shapes, pc, Predictor = _serving_setup(int8=True)
    ref_decoded = model.apply(variables, imgs, train=False)["decoded"]

    mesh = make_2d_mesh(tp=4)
    try:
        pt = Predictor(model, variables, mc, pc, mesh=mesh)
        tp_decoded = pt.model.apply(pt.variables, imgs, train=False)["decoded"]
        dt = pt.detect_letterboxed(imgs, shapes)
    finally:
        set_compute_mesh(None)

    assert np.isfinite(np.asarray(tp_decoded)).all()
    assert np.isfinite(np.asarray(dt["boxes"])).all()
    scale = float(jnp.abs(ref_decoded).max())
    err = float(jnp.abs(tp_decoded - ref_decoded).max())
    assert err <= 0.02 * scale, (err, scale)


def test_canonicalize_qkv_roundtrip_math():
    """Permuted layout consumed rank-locally == original [q|k|v] split."""
    from transparent_object_detection_tpu.parallel.tp import canonicalize_qkv_for_tp

    rng = np.random.default_rng(2)
    c, tp = 16, 4
    kern = rng.normal(size=(c, 3 * c)).astype(np.float32)
    bias = rng.normal(size=(3 * c,)).astype(np.float32)
    tree = {"teb": {"qkv": {"kernel": jnp.asarray(kern), "bias": jnp.asarray(bias)}}}
    out = canonicalize_qkv_for_tp(tree, tp)
    pk = np.asarray(out["teb"]["qkv"]["kernel"])
    pb = np.asarray(out["teb"]["qkv"]["bias"])
    cl = c // tp
    for r in range(tp):
        blk = pk[:, r * 3 * cl : (r + 1) * 3 * cl]
        np.testing.assert_array_equal(blk[:, :cl], kern[:, r * cl : (r + 1) * cl])
        np.testing.assert_array_equal(
            blk[:, cl : 2 * cl], kern[:, c + r * cl : c + (r + 1) * cl]
        )
        np.testing.assert_array_equal(
            blk[:, 2 * cl :], kern[:, 2 * c + r * cl : 2 * c + (r + 1) * cl]
        )
        bblk = pb[r * 3 * cl : (r + 1) * 3 * cl]
        np.testing.assert_array_equal(bblk[:cl], bias[r * cl : (r + 1) * cl])


def test_tp_serving_refuses_without_mesh():
    """A tp_serving model outside the Predictor is a math hazard (its qkv
    weights are canonicalized) — it must raise, not silently fall back."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh

    set_compute_mesh(None)
    model = FocusModel(
        num_classes=1, base_channels=32, base_depth=1, deep_mul=0.5,
        num_heads=8, dtype=jnp.float32, tp_serving=True,
    )
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = FocusModel(
        num_classes=1, base_channels=32, base_depth=1, deep_mul=0.5,
        num_heads=8, dtype=jnp.float32,
    ).init(jax.random.key(0), x, train=False)
    with pytest.raises(RuntimeError, match="tp_serving"):
        model.apply(variables, x, train=False)


def test_tp_param_spec_generic_big_kernels():
    """Round-4 rule: big non-TEB kernels column-shard over the model axis
    under a TP mesh (GSPMD partitions the convs) — this is what lets the
    phi='l'/'x' non-TEB weight mass (3.8B/22.6B params) fit per chip."""
    big_conv = np.zeros((3, 3, 512, 512))  # 2.36M elements
    small_conv = np.zeros((3, 3, 64, 64))
    big_dense = np.zeros((2048, 2048))
    assert tp_param_spec(["backbone", "c2f", "cv1", "conv", "kernel"], big_conv, tp=4) == P(
        None, None, None, "model"
    )
    assert tp_param_spec(["backbone", "c2f", "cv1", "conv", "kernel"], small_conv, tp=4) == P()
    # without tp (pre-r4 callers) the generic rule is off
    assert tp_param_spec(["backbone", "c2f", "cv1", "conv", "kernel"], big_conv) == P()
    # output axis must divide tp
    assert tp_param_spec(["x", "conv", "kernel"], np.zeros((3, 3, 512, 514)), tp=4) == P()
    # SelfAttention projections excluded (their consumer is a data-axis
    # shard_map; a model-sharded channel axis would force a reshard)
    assert tp_param_spec(["backbone", "attn", "value", "kernel"], big_dense, tp=4) == P()
    # biases of generically sharded kernels stay replicated (applied by
    # GSPMD after its own collective placement)
    assert tp_param_spec(["backbone", "c2f", "cv1", "conv", "bias"], np.zeros((512,)), tp=4) == P()
