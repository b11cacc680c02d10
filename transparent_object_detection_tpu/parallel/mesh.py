"""Device mesh + sharding layout for data-parallel training/serving.

TPU-native replacement for the reference's DP/DDP machinery (SURVEY.md §2.9:
torch DataParallel train.py:286-288, DDP+NCCL train.py:184/284, SyncBN
train.py:273-276, DistributedSampler train.py:389-404):

  * One jax.sharding.Mesh with a `data` axis spanning all chips.
  * The batch is sharded over `data`; parameters/optimizer/EMA state are
    replicated. jit compiles the SAME single-chip train step into an SPMD
    program — XLA inserts the gradient all-reduce over ICI where the math
    demands it (the psum analog of DDP's NCCL allreduce), no explicit
    collectives in user code.
  * SyncBatchNorm comes free: BatchNorm reduces over the *global* batch
    axis because jit semantics are global — the cross-chip mean IS the sync.
  * Multi-host: jax.distributed.initialize + the same mesh over all
    processes; the DataLoader shards files per host (loader.py shard_id).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict with the batch axis split across the mesh."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train state (params/opt/EMA) across the mesh."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), state)


def local_batch_slice(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n
