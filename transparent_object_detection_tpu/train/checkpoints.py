"""Checkpointing via orbax (reference: torch.save in train_step.py:116-131).

Mirrors the reference policy: periodic `ep{N}` checkpoints every
save_period epochs, `best` on minimum validation loss, `last` every epoch.
When EMA is enabled, the EMA weights are what get saved for best/last
(train_step.py:122 saves the EMA state_dict). Full train state (optimizer,
counters) is saved for exact resume — richer than the reference's
weights-only files.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


class CheckpointManager:
    def __init__(self, save_dir: str, save_ema: bool = True):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.save_ema = save_ema
        self._ckpt = ocp.PyTreeCheckpointer()

    # -- low-level -----------------------------------------------------------

    def save_tree(self, name: str, tree: Any) -> str:
        path = os.path.join(self.save_dir, name)
        self._ckpt.save(path, _to_host(tree), force=True)
        return path

    def load_tree(self, name_or_path: str) -> Any:
        path = (
            name_or_path
            if os.path.isabs(name_or_path)
            else os.path.join(self.save_dir, name_or_path)
        )
        return self._ckpt.restore(path)

    def restore_like(self, name_or_path: str, template: Any) -> Any:
        """Restore a checkpoint into the structure of `template` (orbax
        serializes namedtuple/optax states as dicts; this re-attaches the
        original treedef so optimizer state round-trips)."""
        raw = self.load_tree(name_or_path)
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        r_leaves = jax.tree_util.tree_leaves(raw)
        if len(r_leaves) != len(t_leaves):
            raise ValueError(
                f"checkpoint has {len(r_leaves)} leaves, template {len(t_leaves)}"
            )
        return jax.tree_util.tree_unflatten(treedef, r_leaves)

    # -- trainer protocol ------------------------------------------------------

    def weights_of(self, state) -> Dict[str, Any]:
        if self.save_ema:
            return {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        return {"params": state.params, "batch_stats": state.batch_stats}

    def save_epoch(self, state, epoch: int, is_best: bool, period: int) -> None:
        weights = self.weights_of(state)
        if period and epoch % period == 0:
            self.save_tree(f"ep{epoch:03d}_weights", weights)
        if is_best:
            self.save_tree("best_weights", weights)
        self.save_tree("last_weights", weights)
        self.save_tree(
            "last_state",
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


def load_weights_partial(target: Dict[str, Any], source: Dict[str, Any]):
    """Shape-filtered partial weight load (reference train.py:224-239 /
    yolo.py:24-32): copy every leaf whose path exists in `target` with a
    matching shape; report what loaded and what didn't.

    Returns (merged_tree, loaded_paths, skipped_paths).
    """
    loaded, skipped = [], []

    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_s = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(source)[0]
    }

    merged_flat = []
    for kp, tv in flat_t:
        key = jax.tree_util.keystr(kp)
        sv = flat_s.get(key)
        if sv is not None and tuple(np.shape(sv)) == tuple(np.shape(tv)):
            merged_flat.append(np.asarray(sv, dtype=np.asarray(tv).dtype))
            loaded.append(key)
        else:
            merged_flat.append(tv)
            skipped.append(key)
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, merged_flat), loaded, skipped
