"""Training engine: jitted train/eval steps and the epoch driver.

Rebuild of the reference training stack (train.py:300-468,
utils/train_step.py:8-131) as a functional JAX program:

  * One jit-compiled train step: forward (mutable BN) -> loss -> grad ->
    clip(10.0) -> optimizer -> EMA, with the train state donated so
    parameters update in place in HBM.
  * bf16 compute replaces the fp16 GradScaler path (train.py:259-263) —
    TPUs need no loss scaling.
  * Validation runs on the EMA weights with running BN statistics
    (train_step.py:87-111), but on the raw head maps (the reference's
    eval-mode val loss feeds the decoded tensor into the criterion — part
    of bug B7; this is the intended behavior).
  * Freeze phase: backbone updates are masked to zero, keeping optimizer
    state structure stable across the unfreeze boundary (train.py:332-334,
    419-452); loaders and lr schedule are rebuilt at unfreeze, and the EMA
    update counter resyncs exactly like train.py:379-380 / 441-442.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transparent_object_detection_tpu.config import ModelConfig, TrainConfig
from transparent_object_detection_tpu.data.dataset import DetectionDataset
from transparent_object_detection_tpu.data.loader import DataLoader, device_prefetch
from transparent_object_detection_tpu.models.detector import FocusModel, build_model, init_variables
from transparent_object_detection_tpu.train.ema import ema_init, ema_update
from transparent_object_detection_tpu.train.loss import LossConfig, detection_loss
from transparent_object_detection_tpu.train.optimizer import (
    backbone_frozen_mask,
    build_optimizer,
)
from transparent_object_detection_tpu.train.schedule import get_lr_scheduler

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: Array  # int32 scalar
    step: Array  # int32 scalar


def create_train_state(
    model: FocusModel, variables: Dict[str, Any], tx: optax.GradientTransformation,
    ema_updates: int = 0,
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema_init(params),
        ema_batch_stats=ema_init(batch_stats),
        ema_updates=jnp.asarray(ema_updates, dtype=jnp.int32),
        step=jnp.asarray(0, dtype=jnp.int32),
    )


def loss_config_from(model_cfg: ModelConfig, train_cfg: TrainConfig) -> LossConfig:
    return LossConfig(
        num_classes=model_cfg.num_classes,
        reg_max=model_cfg.reg_max,
        strides=model_cfg.strides,
        box_weight=train_cfg.box_weight,
        cls_weight=train_cfg.cls_weight,
        dfl_weight=train_cfg.dfl_weight,
        tal_topk=train_cfg.tal_topk,
        tal_alpha=train_cfg.tal_alpha,
        tal_beta=train_cfg.tal_beta,
        label_smoothing=train_cfg.label_smoothing,
    )


def make_train_step(
    model: FocusModel,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig,
    train_cfg: TrainConfig,
    freeze_backbone: bool = False,
    donate: bool = True,
) -> Callable:
    """Build the jitted (state, batch, lr) -> (state, metrics) step."""

    def step(state: TrainState, batch: Dict[str, Array], lr: Array):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
            )
            total, comps = detection_loss(
                out["raw"], batch["boxes"], batch["labels"], loss_cfg
            )
            return total, (mut["batch_stats"], comps)

        grads, (new_bs, comps) = jax.grad(loss_fn, has_aux=True)(state.params)
        if freeze_backbone:
            # requires_grad=False semantics (reference train.py:332-334):
            # frozen grads are zeroed BEFORE the chain so clip_by_global_norm
            # sees only live gradients and momentum stays zero for frozen
            # leaves (the build_optimizer freeze variant also mask-excludes
            # them from weight decay).
            frozen = backbone_frozen_mask(state.params)
            grads = jax.tree_util.tree_map(
                lambda g, f: jnp.zeros_like(g) if f else g, grads, frozen
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        if freeze_backbone:
            # Belt-and-suspenders: even with a tx whose weight decay is not
            # freeze-masked, frozen params must never move.
            updates = jax.tree_util.tree_map(
                lambda u, f: jnp.zeros_like(u) if f else u, updates, frozen
            )
        params = optax.apply_updates(state.params, updates)

        if train_cfg.ema:
            ema_updates = state.ema_updates + 1
            ema_params = ema_update(
                state.ema_params, params, ema_updates, train_cfg.ema_decay, train_cfg.ema_tau
            )
            ema_bs = ema_update(
                state.ema_batch_stats, new_bs, ema_updates, train_cfg.ema_decay,
                train_cfg.ema_tau,
            )
        else:
            ema_updates, ema_params, ema_bs = (
                state.ema_updates,
                state.ema_params,
                state.ema_batch_stats,
            )

        new_state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
            ema_updates=ema_updates,
            step=state.step + 1,
        )
        return new_state, comps

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: FocusModel, loss_cfg: LossConfig, use_ema: bool = True
) -> Callable:
    """Validation loss on EMA weights, running BN stats, raw head maps."""

    def step(state: TrainState, batch: Dict[str, Array]):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        out = model.apply(
            {"params": params, "batch_stats": bs}, batch["image"], train=False,
            decode=False,
        )
        _, comps = detection_loss(out["raw"], batch["boxes"], batch["labels"], loss_cfg)
        return comps

    return jax.jit(step)


class Trainer:
    """Epoch driver (train.py main loop + train_one_epoch, train_step.py:8-131)."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        model: Optional[FocusModel] = None,
        variables: Optional[Dict[str, Any]] = None,
        verbose: bool = True,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.verbose = verbose
        self.model = model or build_model(model_cfg)
        self.variables = variables or init_variables(self.model, model_cfg, train_cfg.seed)
        self.loss_cfg = loss_config_from(model_cfg, train_cfg)
        self.history: List[Dict[str, float]] = []

    # -- loaders -------------------------------------------------------------

    def _make_loader(self, lines: Sequence[str], batch_size: int, train: bool) -> DataLoader:
        tc = self.train_cfg
        ds = DetectionDataset(
            list(lines),
            input_shape=self.model_cfg.input_shape,
            num_classes=self.model_cfg.num_classes,
            epoch_length=tc.unfreeze_epoch,
            mosaic=tc.mosaic if train else False,
            mosaic_prob=tc.mosaic_prob if train else 0.0,
            mixup=tc.mixup if train else False,
            mixup_prob=tc.mixup_prob if train else 0.0,
            train=train,
            special_aug_ratio=tc.special_aug_ratio if train else 0.0,
            max_boxes=tc.max_boxes,
            seed=tc.seed,
        )
        return DataLoader(
            ds,
            batch_size=batch_size,
            shuffle=train,
            num_workers=tc.num_workers,
            drop_last=True,
            seed=tc.seed,
        )

    # -- main loop -------------------------------------------------------------

    def fit(
        self,
        train_lines: Sequence[str],
        val_lines: Sequence[str],
        callbacks: Sequence[Any] = (),
        checkpointer: Optional[Any] = None,
        sharding=None,
        resume_from: Optional[str] = None,
    ) -> List[Dict[str, float]]:
        tc, mc = self.train_cfg, self.model_cfg
        tx = build_optimizer(tc, self.variables["params"])
        state = create_train_state(self.model, self.variables, tx)
        if resume_from is not None:
            # Exact resume: full train state incl. optimizer and EMA counters
            # (richer than the reference's weights-only Init_Epoch restart,
            # train.py:81/127/224-239). Set train_cfg.init_epoch to match.
            if checkpointer is None:
                raise ValueError("resume_from requires a checkpointer")
            restored = checkpointer.restore_like(
                resume_from,
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "ema_params": state.ema_params,
                    "ema_batch_stats": state.ema_batch_stats,
                    "ema_updates": state.ema_updates,
                    "step": state.step,
                },
            )
            state = TrainState(**restored)

        frozen_phase = tc.freeze_train and tc.init_epoch < tc.freeze_epoch
        batch_size = tc.freeze_batch_size if frozen_phase else tc.unfreeze_batch_size

        def build_phase(bs: int, frozen: bool):
            init_lr, min_lr = tc.fit_lr(bs)
            sched = get_lr_scheduler(tc.lr_decay_type, init_lr, min_lr, tc.unfreeze_epoch)
            # The freeze-phase chain differs only in its weight-decay mask —
            # same state structure, so opt_state carries across unfreeze.
            phase_tx = (
                build_optimizer(tc, self.variables["params"], freeze_backbone=True)
                if frozen
                else tx
            )
            step_fn = make_train_step(self.model, phase_tx, self.loss_cfg, tc, freeze_backbone=frozen)
            tl = self._make_loader(train_lines, bs, train=True)
            vl = self._make_loader(val_lines, bs, train=False)
            return sched, step_fn, tl, vl

        sched, train_step, train_loader, val_loader = build_phase(batch_size, frozen_phase)
        eval_step = make_eval_step(self.model, self.loss_cfg, use_ema=tc.ema)
        steps_per_epoch = len(train_loader)
        if steps_per_epoch == 0 or len(val_loader) == 0:
            raise ValueError("dataset too small for the batch size")
        if tc.init_epoch:
            state = state.replace(
                ema_updates=jnp.asarray(steps_per_epoch * tc.init_epoch, jnp.int32)
            )

        best_val = float("inf")
        unfroze = not frozen_phase
        for epoch in range(tc.init_epoch, tc.unfreeze_epoch):
            if tc.freeze_train and not unfroze and epoch >= tc.freeze_epoch:
                batch_size = tc.unfreeze_batch_size
                sched, train_step, train_loader, val_loader = build_phase(batch_size, False)
                steps_per_epoch = len(train_loader)
                state = state.replace(
                    ema_updates=jnp.asarray(steps_per_epoch * epoch, jnp.int32)
                )
                unfroze = True

            train_loader.set_epoch(epoch)
            val_loader.set_epoch(epoch)
            lr = float(sched(epoch))

            t0 = time.time()
            # Per-step metrics stay ON DEVICE: a float() per step would block
            # dispatch on each step's completion and forfeit the async-
            # dispatch overlap device_prefetch exists to feed. One stack+sum
            # (and one host sync) per epoch instead.
            tr_losses = []
            for batch in device_prefetch(iter(train_loader), sharding=sharding):
                state, comps = train_step(state, batch, jnp.asarray(lr, jnp.float32))
                tr_losses.append(comps["loss"])
            n_tr = len(tr_losses)
            tr_loss = float(jnp.stack(tr_losses).sum()) if tr_losses else 0.0

            va_losses = []
            for batch in device_prefetch(iter(val_loader), sharding=sharding):
                comps = eval_step(state, batch)
                va_losses.append(comps["loss"])
            n_va = len(va_losses)
            va_loss = float(jnp.stack(va_losses).sum()) if va_losses else 0.0

            logs = {
                "epoch": epoch,
                "loss": tr_loss / max(n_tr, 1),
                "val_loss": va_loss / max(n_va, 1),
                "lr": lr,
                "epoch_seconds": time.time() - t0,
            }
            self.history.append(logs)
            if self.verbose:
                print(
                    f"epoch {epoch + 1}/{tc.unfreeze_epoch} "
                    f"loss={logs['loss']:.4f} val_loss={logs['val_loss']:.4f} "
                    f"lr={lr:.2e} ({logs['epoch_seconds']:.1f}s, "
                    f"{n_tr * batch_size / max(logs['epoch_seconds'], 1e-9):.1f} imgs/s)"
                )
            for cb in callbacks:
                cb.on_epoch_end(epoch + 1, logs, self, state)

            if checkpointer is not None:
                is_best = logs["val_loss"] < best_val
                best_val = min(best_val, logs["val_loss"])
                checkpointer.save_epoch(state, epoch + 1, is_best=is_best,
                                        period=tc.save_period)

        self.variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        self.ema_variables = {
            "params": jax.device_get(state.ema_params),
            "batch_stats": jax.device_get(state.ema_batch_stats),
        }
        return self.history
