"""Tensor-parallel parameter sharding for the attention/MLP-heavy scales.

The reference ships data parallelism only (SURVEY.md §2.9), but the phi
'l'/'x' scales carry up to 8192-channel transformer blocks whose weights and
activations outgrow one chip. This module adds Megatron-style sharding over
a second `model` mesh axis for the TEB projections:

    qkv / mlp1 kernels   : column-parallel  P(None, 'model')
    attn_out / mlp2      : row-parallel     P('model', None)
    qkv / mlp1 biases    : P('model')
    everything else      : replicated

Under jit's global SPMD semantics that is all that is needed — XLA
propagates the shardings through the matmuls and inserts the
reduce-scatter/all-gather collectives over ICI. The math is unchanged
(tests prove sharded == single-device), only the layout is.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"

_COLUMN_PARALLEL = ("qkv", "mlp1")  # output-dim sharded
_ROW_PARALLEL = ("attn_out", "mlp2")  # input-dim sharded


def make_2d_mesh(
    tp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """(data, model) mesh: `tp`-way model axis, data axis over the rest."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(len(devices) // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def tp_param_spec(path_names: Sequence[str], leaf) -> P:
    """PartitionSpec for one parameter leaf, by its module path."""
    if not path_names or path_names[-1] not in ("kernel", "bias"):
        return P()
    parent = path_names[-2] if len(path_names) > 1 else ""
    is_kernel = path_names[-1] == "kernel"
    if parent in _COLUMN_PARALLEL:
        if is_kernel:
            return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
        return P(MODEL_AXIS)  # bias along the sharded output dim
    if parent in _ROW_PARALLEL and is_kernel:
        return P(*([None] * (leaf.ndim - 2)), MODEL_AXIS, None)
    return P()


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching `params` (replicated except TEB blocks)."""

    def spec_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return NamedSharding(mesh, tp_param_spec(names, leaf))

    return jax.tree_util.tree_map_with_path(spec_fn, params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree across the mesh with TP shardings."""
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
