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

# Kernels at/above this element count are worth sharding even outside the
# TEBs (generic output-channel column-parallel, handled by GSPMD — convs and
# denses are plain XLA ops). The big phi='l'/'x' backbone C2f convs reach
# 0.1-0.9B params EACH (e.g. phi='x' dark5 bottlenecks: 3x3x10240x10240);
# without this the replicated non-TEB weights alone (3.8B params at 'l',
# 22.6B at 'x') exceed a chip. Small kernels stay replicated — sharding them
# buys nothing and costs collectives.
GENERIC_SHARD_MIN_SIZE = 1 << 20


def make_2d_mesh(
    tp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """(data, model) mesh: `tp`-way model axis, data axis over the rest."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(len(devices) // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def tp_param_spec(path_names: Sequence[str], leaf, tp: Optional[int] = None) -> P:
    """PartitionSpec for one parameter leaf, by its module path.

    tp (the model-axis size) enables the generic big-kernel rule: any
    `kernel` leaf of >= GENERIC_SHARD_MIN_SIZE elements whose output axis
    divides tp is column-sharded over the model axis — GSPMD partitions the
    surrounding convs/denses and inserts the collectives. Pass tp=None to
    restrict sharding to the explicit TEB-projection rules (the pre-r4
    behavior)."""
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
    if (
        tp is not None
        and is_kernel
        and leaf.ndim >= 2
        and int(np.prod(leaf.shape)) >= GENERIC_SHARD_MIN_SIZE
        and leaf.shape[-1] % tp == 0
        # SelfAttention q/k/v outputs feed a DATA-axis shard_map (the flash
        # kernels, ops/shard.py) — a model-sharded channel axis there forces
        # an SPMD full-rematerialization reshard of the (B, N, C) activation
        # every call. Their kernels are small (<= C x C); keep replicated.
        and parent not in ("query", "key", "value")
    ):
        return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
    return P()


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching `params` (replicated except the TEB
    blocks and, when the mesh has a model axis, big generic kernels)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS)

    def spec_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return NamedSharding(mesh, tp_param_spec(names, leaf, tp))

    return jax.tree_util.tree_map_with_path(spec_fn, params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree across the mesh with TP shardings."""
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def canonicalize_qkv_for_tp(params: Any, tp: int) -> Any:
    """Permute every fused-qkv projection into rank-major column order.

    The stored layout is [q | k | v] (each C wide); a contiguous model-axis
    shard of that 3C axis would split MID-SECTION across ranks. The TP
    serving path (ops/teb_tp.py) instead wants rank r's shard to be exactly
    (q_r | k_r | v_r) — its heads/tp contiguous heads of each section — so
    this transform reorders the columns to
    [q_0 | k_0 | v_0 | q_1 | k_1 | v_1 | ...]. Pure relabeling: consumed
    consistently by teb_tp_forward's local split, exact same math.

    Applied by inference.Predictor on ITS copy of the weights only — the
    canonical checkpoint layout never changes, and a canonicalized tree must
    never be applied through a non-tp_serving model.
    """

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, val in tree.items():
            if (
                key == "qkv" and isinstance(val, dict) and "kernel" in val
                and val["kernel"].ndim == 2
                and val["kernel"].shape[1] == 3 * val["kernel"].shape[0]
            ):
                kern = val["kernel"]
                c = kern.shape[0]
                if c % tp:
                    raise ValueError(
                        f"qkv width {c} not divisible by tp={tp}"
                    )
                # (C, 3, tp, C/tp) -> (C, tp, 3, C/tp) -> (C, 3C)
                perm = (
                    kern.reshape(c, 3, tp, c // tp)
                    .transpose(0, 2, 1, 3)
                    .reshape(c, 3 * c)
                )
                new = dict(val, kernel=perm)
                if "bias" in val and val["bias"].ndim == 1:
                    new["bias"] = (
                        val["bias"].reshape(3, tp, c // tp)
                        .transpose(1, 0, 2)
                        .reshape(3 * c)
                    )
                out[key] = new
            else:
                out[key] = walk(val)
        return out

    return walk(params)
