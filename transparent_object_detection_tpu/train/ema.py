"""Exponential moving average of model variables as a pure pytree transform.

Rebuild of reference ModelEMA (model/train_utils.py:29-91): fp32 shadow of
the full variable set (params AND batch_stats — the reference averages every
floating state_dict entry, including BN running stats), with the ramped
decay d * (1 - exp(-updates / tau)), d=0.9999, tau=2000.

No module deep-copy, no host sync: the EMA lives inside the jitted train
step as two extra pytrees in the train state.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def ema_decay(updates: Array, decay: float = 0.9999, tau: int = 2000) -> Array:
    """Ramped decay (train_utils.py:54)."""
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_init(tree: Any) -> Any:
    """fp32 copy of a variable pytree.

    Must be a real copy (not an aliasing asarray): the train state is donated
    to the jitted step, and params/ema_params sharing a buffer would mean
    donating the same buffer twice.
    """
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, dtype=jnp.float32, copy=True), tree
    )


def ema_update(ema_tree: Any, new_tree: Any, updates: Array, decay: float = 0.9999,
               tau: int = 2000) -> Any:
    """One EMA step: ema = d * ema + (1 - d) * new (train_utils.py:74-82).

    `updates` is the post-increment counter (reference increments before
    computing the decay).
    """
    d = ema_decay(updates, decay, tau)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(jnp.float32), ema_tree, new_tree
    )
