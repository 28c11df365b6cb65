"""Multi-host initialization and scaling measurement.

The reference is strictly single-process (SURVEY §2.3).  Scale-out here is
SPMD: every host runs the same program; ``init_distributed()`` wires the
JAX runtime across hosts, after which ``jax.devices()`` spans the whole
slice and the standard mesh helpers shard the env batch globally (ICI
within a slice, DCN across slices) — XLA collectives are the only
communication layer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime; returns True when the process is
    part of a multi-process job afterwards.

    Callers opt in explicitly (train.py gates on JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / MARL_DMFB_DISTRIBUTED), so initialization failures
    propagate loudly instead of silently degrading to single-process.

    With TPU pod metadata available all arguments are auto-detected; on
    other platforms pass them or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # NOTE: must not touch the backend (jax.devices/process_count) before
    # initialize() — that would bind the runtime single-process.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection inside initialize()
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count() > 1
