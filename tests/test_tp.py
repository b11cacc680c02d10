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
