"""Mesh-based scale-out: env batch sharded over chips, params replicated.

The reference has no distributed layer at all (SURVEY §2.3).  The TPU-native
equivalent needs no hand-written communication: we lay out a 1-D
``jax.sharding.Mesh`` over all devices, shard every batch-leading array
(env states, rollout outputs, replay buffer, minibatches) on the ``batch``
axis, and replicate learner parameters.  XLA then inserts the gradient
``psum`` over ICI inside the jitted learn step automatically — the
collectives ARE the backend (no NCCL/MPI analog to port).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
``jax.devices()`` then spans hosts and the same program runs SPMD, with the
batch axis split across hosts (DCN) and chips (ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def mesh_from_flag(flag: str) -> Optional[Mesh]:
    """Resolve the ``--mesh`` CLI flag to a mesh (or None for single-device).

    * ``"auto"``: mesh over all devices when more than one is visible
      (multi-chip host or multi-host after ``jax.distributed.initialize``),
      else no mesh;
    * ``"off"``: no mesh;
    * ``"<n>"``: mesh over the first n devices (n must be available).
    """
    flag = (flag or "auto").lower()
    if flag == "off":
        return None
    devices = jax.devices()
    if flag == "auto":
        return make_mesh(devices) if len(devices) > 1 else None
    n = int(flag)
    if n <= 1:
        return None
    if n > len(devices):
        raise ValueError(
            f"--mesh={n} but only {len(devices)} devices are visible"
        )
    return make_mesh(devices[:n])


def shard_batch(mesh: Mesh, tree):
    """Place a PyTree with leading batch axes onto the mesh, sharded on
    axis 0.  Scalar/unbatched leaves are replicated."""
    n = mesh.devices.size

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a PyTree (parameters, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))
