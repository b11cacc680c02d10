"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Verifies: sharded-batch training step == single-device step (same global
math, XLA inserts the gradient all-reduce), SyncBN-for-free semantics, and
loader sharding integration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
from transparent_object_detection_tpu.models import FocusModel
from transparent_object_detection_tpu.parallel import (
    local_batch_slice,
    make_mesh,
    replicate_state,
    shard_batch,
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


def make_batch(b=8, key=0):
    rng = np.random.default_rng(key)
    batch = {
        "image": jnp.asarray(rng.uniform(size=(b, 64, 64, 3)), jnp.float32),
        "boxes": jnp.zeros((b, 4, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "labels": jnp.zeros((b, 4), jnp.int32),
    }
    return batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert local_batch_slice(16, mesh) == 2


def test_sharded_step_matches_single_device():
    mc = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    tc = TrainConfig(max_boxes=4, optimizer_type="sgd", ema=True)
    model = tiny_model()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    tx = build_optimizer(tc, variables["params"])
    lc = loss_config_from(mc, tc)
    batch = make_batch(8)
    lr = jnp.asarray(1e-3)

    # single-device reference
    state1 = create_train_state(model, variables, tx)
    step1 = make_train_step(model, tx, lc, tc, donate=False)
    new1, comps1 = step1(state1, batch, lr)

    # 8-way data-parallel
    mesh = make_mesh()
    state8 = replicate_state(create_train_state(model, variables, tx), mesh)
    step8 = make_train_step(model, tx, lc, tc, donate=False)
    new8, comps8 = step8(state8, shard_batch(batch, mesh), lr)

    assert float(comps1["loss"]) == pytest.approx(float(comps8["loss"]), rel=1e-4)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new1.params, new8.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 5e-5


def test_batchnorm_stats_are_global():
    """BN means under a sharded batch must equal the global-batch means —
    the SyncBN-for-free property."""
    mc = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    tc = TrainConfig(max_boxes=4, optimizer_type="sgd", ema=False)
    model = tiny_model()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    tx = build_optimizer(tc, variables["params"])
    lc = loss_config_from(mc, tc)
    # batch where shard contents differ wildly: global stats != per-shard stats
    rngs = np.random.default_rng(1)
    imgs = np.concatenate(
        [rngs.uniform(i, i + 1, size=(1, 64, 64, 3)) for i in range(8)], axis=0
    ).astype(np.float32)
    batch = make_batch(8)
    batch["image"] = jnp.asarray(imgs)

    step = make_train_step(model, tx, lc, tc, donate=False)
    s_single = step(create_train_state(model, variables, tx), batch, jnp.asarray(0.0))[0]

    mesh = make_mesh()
    s_shard = step(
        replicate_state(create_train_state(model, variables, tx), mesh),
        shard_batch(batch, mesh),
        jnp.asarray(0.0),
    )[0]
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_single.batch_stats, s_shard.batch_stats
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
