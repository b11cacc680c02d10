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

from typing import Optional, Tuple

_MESH = None
_AXIS: str = "data"


def set_compute_mesh(mesh, axis_name: str = "data") -> None:
    """Register (or clear, with None) the mesh used to shard the custom
    serving kernels across chips."""
    global _MESH, _AXIS
    _MESH = mesh
    _AXIS = axis_name


def get_compute_mesh() -> Tuple[Optional[object], str]:
    return _MESH, _AXIS


def maybe_shard_map(fn, batch_arg_indices=None):
    """Wrap `fn` in shard_map over the registered mesh's data axis.

    Args at `batch_arg_indices` (default: all) are sharded on their leading
    axis; the rest are replicated. The single output is sharded on its
    leading axis. Returns `fn` unchanged when no mesh is registered.
    """
    if _MESH is None:
        return fn
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    batch = P(_AXIS)
    repl = P()

    def specs(n):
        if batch_arg_indices is None:
            return tuple(batch for _ in range(n))
        return tuple(
            batch if i in batch_arg_indices else repl for i in range(n)
        )

    def wrapped(*args):
        return shard_map(
            fn, mesh=_MESH, in_specs=specs(len(args)), out_specs=batch,
            check_rep=False,
        )(*args)

    return wrapped
