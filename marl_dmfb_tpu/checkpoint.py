"""Full-state checkpointing (Orbax).

The reference pickles model weights only (policy/vdn.py:205-218) — optimizer
state, epsilon, step counters and PRNG are lost on resume (SURVEY §5).
Here a checkpoint is the complete training state PyTree, so resume is exact.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save(path: str, tree: Any) -> None:
    """Save a checkpoint tree (collective under multi-process: every
    process must call this on the same path; orbax coordinates through the
    jax.distributed service).

    Multi-host wrinkle (surfaced by the 2-process ring test,
    tests/_distributed_worker.py): orbax can only serialize GLOBAL
    jax.Arrays in a multi-process job — host-local single-device arrays
    (the trainer's ``epsilon``/``key`` scalars, which never join the mesh)
    make it raise "Cannot serialize host local jax.Array".  Those leaves
    are value-identical on every process, so they are converted to numpy
    (written by the primary host) before the save."""
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        import numpy as np

        tree = jax.tree.map(
            lambda x: np.asarray(x)
            if isinstance(x, jax.Array) and x.is_fully_addressable
            else x,
            tree,
        )
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore(path: str, like: Any = None) -> Any:
    """Restore a checkpoint tree.

    Arrays are restored host-side (NumPy) and transferred to device on
    first use: restoring straight to a tunneled TPU issues one RPC per
    array and takes minutes for large trees.

    Raises ``FileNotFoundError`` for a missing checkpoint and propagates
    corruption errors loudly (a corrupt checkpoint must never silently fall
    through to a different restore mode)."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint directory at {path}")
    ckptr = ocp.PyTreeCheckpointer()
    import numpy as np

    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    if tree is None:
        # metadata-less layout (older orbax format): attempt a direct
        # restore, optionally against a template tree.  Under orbax 0.11
        # this always raises FileNotFoundError ("No structure could be
        # identified") — the pinned environment cannot reconstruct a
        # PyTree without _METADATA at all — which is the correct LOUD
        # failure; the branch stays for orbax versions that can read
        # aggregate-file checkpoints.  Behavior pinned by
        # tests/test_checkpoint_layouts.py.
        if like is None:
            return ckptr.restore(path)
        return ckptr.restore(path, item=like)
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray)
        if hasattr(m, "shape") else ocp.RestoreArgs(),
        tree,
    )
    return ckptr.restore(path, restore_args=restore_args)


def latest_step_dir(root: str, prefix: str) -> str | None:
    if not os.path.isdir(root):
        return None
    cands = [d for d in os.listdir(root) if d.startswith(prefix)]
    if not cands:
        return None
    return os.path.join(root, sorted(cands)[-1])
