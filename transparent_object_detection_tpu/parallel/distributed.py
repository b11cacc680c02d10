"""Multi-host bring-up helpers.

The reference's process-group bootstrap (dist.init_process_group("nccl"),
rank/world-size from env, train.py:184-186) maps to a single
jax.distributed.initialize call: afterwards jax.devices() spans every host
and the same Mesh/pjit code scales over DCN with zero further changes.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-process.

    No-ops (returns False) in single-process runs so the same entrypoint
    works everywhere. Arguments default to the standard JAX env vars.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()
