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
    path = os.path.abspath(path)
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
        # metadata-less layout (older orbax format): restore directly,
        # optionally against a template tree
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
