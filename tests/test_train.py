"""Training-engine tests: schedules, EMA, optimizer masks, end-to-end
2-image smoke training (the SURVEY.md §4 fake-dataset strategy)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
from transparent_object_detection_tpu.models import FocusModel
from transparent_object_detection_tpu.train.ema import ema_decay, ema_init, ema_update
from transparent_object_detection_tpu.train.optimizer import (
    backbone_frozen_mask,
    build_optimizer,
    weight_decay_mask,
)
from transparent_object_detection_tpu.train.schedule import get_lr_scheduler
from transparent_object_detection_tpu.train.trainer import (
    Trainer,
    create_train_state,
    loss_config_from,
    make_eval_step,
    make_train_step,
)


# ---------------------------------------------------------------- schedules
def test_cosine_schedule_shape():
    fn = get_lr_scheduler("cos", 1e-2, 1e-4, 100)
    # warmup start
    assert fn(0) == pytest.approx(max(0.1 * 1e-2, 1e-6), rel=1e-6)
    # warmup is quadratic and reaches lr at iter 3
    assert fn(3) == pytest.approx(1e-2, rel=1e-6)
    # final no-aug window pinned at min_lr
    assert fn(99) == pytest.approx(1e-4)
    assert fn(95) == pytest.approx(1e-4)
    # midway between warmup and floor
    mid = fn(49)
    assert 1e-4 < mid < 1e-2


def test_step_schedule():
    fn = get_lr_scheduler("step", 1e-2, 1e-4, 100, step_num=3)
    assert fn(0) == pytest.approx(1e-2)
    assert fn(99) < fn(0)


def test_fit_lr_clamps():
    tc = TrainConfig(optimizer_type="sgd", init_lr=1e-2)
    init_fit, min_fit = tc.fit_lr(16)
    # 16/64 * 1e-2 = 2.5e-3 within [5e-4, 5e-2]
    assert init_fit == pytest.approx(2.5e-3)
    tc2 = TrainConfig(optimizer_type="adam", init_lr=1e-1)
    i2, _ = tc2.fit_lr(64)
    assert i2 == pytest.approx(1e-3)  # clamped at adam max


# ---------------------------------------------------------------- EMA
def test_ema_decay_ramp():
    assert float(ema_decay(jnp.asarray(1))) < 0.001
    assert float(ema_decay(jnp.asarray(20000))) == pytest.approx(0.9999, rel=1e-3)


def test_ema_update_moves_toward_new():
    ema = ema_init({"w": jnp.zeros(3)})
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, jnp.asarray(2000))
    v = float(out["w"][0])
    assert 0 < v < 1
    # early updates weight the new model heavily (low decay)
    out_early = ema_update(ema, new, jnp.asarray(1))
    assert float(out_early["w"][0]) > 0.9


# ---------------------------------------------------------------- masks
def test_weight_decay_mask_kernels_only():
    params = {
        "conv": {"kernel": jnp.zeros((3, 3)), "bias": jnp.zeros(3)},
        "bn": {"scale": jnp.zeros(3), "bias": jnp.zeros(3)},
        "gamma": jnp.zeros(1),
    }
    mask = weight_decay_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False
    assert mask["gamma"] is False


def test_backbone_frozen_mask():
    params = {"backbone": {"stem": {"kernel": 1}}, "head": {"kernel": 1}}
    m = backbone_frozen_mask(params)
    assert m["backbone"]["stem"]["kernel"] is True
    assert m["head"]["kernel"] is False


# ---------------------------------------------------------------- smoke train
@pytest.fixture(scope="module")
def fake_lines(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    lines = []
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, size=(80, 96, 3), dtype=np.uint8)
        arr[20:60, 30:70] = (255, 0, 0)
        p = str(root / f"t{i}.png")
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 30,20,70,60,0")
    return lines


def tiny_cfgs(**train_over):
    mc = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    defaults = dict(
        init_epoch=0,
        freeze_epoch=1,
        unfreeze_epoch=2,
        freeze_train=True,
        freeze_batch_size=2,
        unfreeze_batch_size=2,
        num_workers=2,
        mosaic=False,
        mixup=False,
        max_boxes=8,
        save_period=1,
        optimizer_type="sgd",
    )
    defaults.update(train_over)
    return mc, TrainConfig(**defaults)


def tiny_model():
    return FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32,
    )


def test_train_step_updates_params_and_ema(fake_lines):
    mc, tc = tiny_cfgs()
    model = tiny_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    tx = build_optimizer(tc, variables["params"])
    state = create_train_state(model, variables, tx)
    lc = loss_config_from(mc, tc)
    step = make_train_step(model, tx, lc, tc, freeze_backbone=False, donate=False)

    batch = {
        "image": jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([[0.5, 0.5, 0.4, 0.4]]), (2, 8, 1)) * 0,
        "labels": jnp.zeros((2, 8), jnp.int32),
    }
    batch["boxes"] = batch["boxes"].at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4]))

    new_state, comps = step(state, batch, jnp.asarray(1e-3))
    assert int(new_state.step) == 1
    assert int(new_state.ema_updates) == 1
    # params changed
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    assert np.isfinite(float(comps["loss"]))


def test_train_step_freeze_keeps_backbone(fake_lines):
    mc, tc = tiny_cfgs()
    model = tiny_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    tx = build_optimizer(tc, variables["params"])
    state = create_train_state(model, variables, tx)
    lc = loss_config_from(mc, tc)
    step = make_train_step(model, tx, lc, tc, freeze_backbone=True, donate=False)
    batch = {
        "image": jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.zeros((2, 8, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "labels": jnp.zeros((2, 8), jnp.int32),
    }
    new_state, _ = step(state, batch, jnp.asarray(1e-3))
    bb_delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["backbone"],
        new_state.params["backbone"],
    )
    assert max(jax.tree_util.tree_leaves(bb_delta)) == 0.0
    head_delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["head"],
        new_state.params["head"],
    )
    assert max(jax.tree_util.tree_leaves(head_delta)) > 0.0


def test_freeze_phase_optimizer_state_stays_zero(fake_lines):
    """requires_grad=False semantics (reference train.py:332-334): during the
    freeze phase, frozen leaves accumulate exactly zero momentum and zero
    weight decay, and the global-norm clip sees only live gradients."""
    mc, tc = tiny_cfgs()
    model = tiny_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    tx = build_optimizer(tc, variables["params"], freeze_backbone=True)
    state = create_train_state(model, variables, tx)
    lc = loss_config_from(mc, tc)
    step = make_train_step(model, tx, lc, tc, freeze_backbone=True, donate=False)
    batch = {
        "image": jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.zeros((2, 8, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "labels": jnp.zeros((2, 8), jnp.int32),
    }
    for _ in range(3):
        state, _ = step(state, batch, jnp.asarray(1e-3))

    # momentum (optax.trace) state for every frozen leaf is exactly zero
    trace_state = [s for s in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda n: hasattr(n, "trace")
    ) if hasattr(s, "trace")]
    assert trace_state, "expected an optax.trace state in the chain"
    frozen_momentum = trace_state[0].trace["backbone"]
    assert max(
        float(jnp.abs(leaf).max()) for leaf in jax.tree_util.tree_leaves(frozen_momentum)
    ) == 0.0
    # live momentum is nonzero (the optimizer is actually doing work)
    live_momentum = trace_state[0].trace["head"]
    assert max(
        float(jnp.abs(leaf).max()) for leaf in jax.tree_util.tree_leaves(live_momentum)
    ) > 0.0


def test_freeze_phase_clip_ignores_backbone_grads(fake_lines):
    """The clip scale during freeze must be computed from live grads only:
    the frozen step's head update equals the update of a step where backbone
    grads were never produced at all."""
    mc, tc = tiny_cfgs()
    model = tiny_model()
    # tiny clip norm so clipping is active and any extra grad mass changes it
    tc = TrainConfig(**{**{f.name: getattr(tc, f.name) for f in
                           __import__("dataclasses").fields(tc)},
                        "grad_clip_norm": 1e-3})
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    lc = loss_config_from(mc, tc)
    batch = {
        "image": jnp.asarray(np.random.default_rng(2).uniform(size=(2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.zeros((2, 8, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "labels": jnp.zeros((2, 8), jnp.int32),
    }

    tx_f = build_optimizer(tc, variables["params"], freeze_backbone=True)
    state_f = create_train_state(model, variables, tx_f)
    step_f = make_train_step(model, tx_f, lc, tc, freeze_backbone=True, donate=False)
    new_f, _ = step_f(state_f, batch, jnp.asarray(1e-3))

    # oracle: manually zero backbone grads, then run the same chain
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state_f.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        from transparent_object_detection_tpu.train.loss import detection_loss
        total, _ = detection_loss(out["raw"], batch["boxes"], batch["labels"], lc)
        return total

    grads = jax.grad(loss_fn)(state_f.params)
    grads = jax.tree_util.tree_map(
        lambda g, f: jnp.zeros_like(g) if f else g, grads,
        backbone_frozen_mask(state_f.params),
    )
    import optax
    updates, _ = tx_f.update(grads, tx_f.init(state_f.params), state_f.params)
    expect_head = optax.apply_updates(
        state_f.params["head"],
        jax.tree_util.tree_map(lambda u: -1e-3 * u, updates["head"]),
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new_f.params["head"], expect_head
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-7


def test_trainer_fit_two_epochs(fake_lines, tmp_path):
    mc, tc = tiny_cfgs(save_dir=str(tmp_path / "logs"))
    trainer = Trainer(mc, tc, model=tiny_model())
    from transparent_object_detection_tpu.train.checkpoints import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    history = trainer.fit(fake_lines, fake_lines, checkpointer=ckpt)
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) and np.isfinite(h["val_loss"]) for h in history)
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "best_weights"))
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "last_weights"))
    # restore roundtrip
    restored = ckpt.load_tree("best_weights")
    assert "params" in restored and "batch_stats" in restored


def test_load_weights_partial_shape_filter():
    from transparent_object_detection_tpu.train.checkpoints import load_weights_partial

    target = {"a": np.zeros((2, 2)), "b": {"k": np.zeros(3)}, "c": np.zeros(1)}
    source = {"a": np.ones((2, 2)), "b": {"k": np.ones(4)}, "d": np.ones(1)}
    merged, loaded, skipped = load_weights_partial(target, source)
    np.testing.assert_allclose(merged["a"], 1.0)
    np.testing.assert_allclose(merged["b"]["k"], 0.0)  # shape mismatch skipped
    assert len(loaded) == 1 and len(skipped) == 2
