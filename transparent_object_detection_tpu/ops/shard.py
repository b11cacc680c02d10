"""Shared mesh registry for SPMD execution of the Pallas serving kernels.

GSPMD cannot auto-partition a `pallas_call`, so every custom kernel on the
serving path (flash attention, int8 flash attention, the fused int8 matmul)
must be explicitly wrapped in `shard_map` over the data axis when running on
a multi-chip mesh. This module is the single registration point: serving
entries (`inference.Predictor(mesh=...)`, `api.FOCUS.serve_mesh()`) and the
training driver (`tools/train.py --data-parallel`) register the mesh here,
and the kernel dispatchers consult it at trace time.

The registry is process-global trace-time state (like the Pallas INTERPRET
flags): programs traced while a mesh is registered bake the shard_map in.
Re-register (or clear with None) before building programs for a different
topology.

The reference has no multi-device serving story at all
(reference predict.py:16-189); this is where the TPU rebuild scales past it
— the serving path is embarrassingly parallel over the batch axis, so
aggregate mesh throughput is chips x per-chip.
"""
from __future__ import annotations

import contextlib
from typing import Optional, Tuple

_MESH = None
_AXIS: str = "data"


@contextlib.contextmanager
def local_compute():
    """Trace-time escape hatch: code traced inside this context sees NO
    registered mesh, so the kernel dispatchers emit plain (per-shard local)
    programs. Used by hand-written shard_map regions (ops/teb_tp.py) whose
    local functions call mesh-consulting entry points like quant_matmul /
    attention — without this they would try to nest a second shard_map."""
    global _MESH
    saved = _MESH
    _MESH = None
    try:
        yield
    finally:
        _MESH = saved


def set_compute_mesh(mesh, axis_name: str = "data") -> None:
    """Register (or clear, with None) the mesh used to shard the custom
    serving kernels across chips."""
    global _MESH, _AXIS
    _MESH = mesh
    _AXIS = axis_name


def get_compute_mesh() -> Tuple[Optional[object], str]:
    return _MESH, _AXIS


def maybe_shard_map(fn, batch_arg_indices=None, n_out: int = 1):
    """Wrap `fn` in shard_map over the registered mesh's data axis.

    Args at `batch_arg_indices` (default: all) are sharded on their leading
    axis; the rest are replicated. Each of the `n_out` outputs is sharded on
    its leading axis. Returns `fn` unchanged when no mesh is registered.
    """
    if _MESH is None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    batch = P(_AXIS)
    repl = P()

    def specs(n):
        if batch_arg_indices is None:
            return tuple(batch for _ in range(n))
        return tuple(
            batch if i in batch_arg_indices else repl for i in range(n)
        )

    out_specs = batch if n_out == 1 else tuple(batch for _ in range(n_out))

    def wrapped(*args):
        return shard_map(
            fn, mesh=_MESH, in_specs=specs(len(args)), out_specs=out_specs,
            check_vma=False,
        )(*args)

    return wrapped


def maybe_shard_map_attention(make_fn, num_heads: int, model_axis: str = "model"):
    """shard_map wrapper for the (q, k, v) -> out flash kernels, tensor-
    parallel aware.

    On a 1-D data mesh: batch-axis sharding (as maybe_shard_map). On a 2-D
    (data, model) mesh with num_heads divisible by the model-axis size, the
    packed-head channel axis is ALSO sharded over `model` — Megatron
    column-parallel qkv projections (parallel/tp.py) leave exactly
    heads/tp contiguous heads on each model rank, so attention is local per
    rank with zero collectives; `make_fn(local_heads)` builds the kernel
    launcher for the per-rank head count. Falls back to batch-only sharding
    (channel replicated — tp-redundant attention compute) when heads don't
    divide. With no mesh registered, returns the plain `make_fn(num_heads)`
    launcher.
    """
    if _MESH is None:
        return make_fn(num_heads)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis_sizes = dict(zip(_MESH.axis_names, _MESH.devices.shape))
    tp = axis_sizes.get(model_axis, 1)
    if tp > 1 and num_heads % tp == 0:
        spec = P(_AXIS, None, model_axis)
        fn = make_fn(num_heads // tp)
    else:
        spec = P(_AXIS)
        fn = make_fn(num_heads)

    def wrapped(q, k, v):
        return shard_map(
            fn, mesh=_MESH, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)

    return wrapped
