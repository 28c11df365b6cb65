"""TPU-native biochip routing environments.

Pure-functional JAX re-designs of the reference simulators:

* :mod:`marl_dmfb_tpu.envs.dmfb` — coarse-grid DMFB chip
  (reference: env/DMFB/dmfb.py)
* :mod:`marl_dmfb_tpu.envs.meda` — fine-grained MEDA array
  (reference: env/MEDA/meda.py)

Each environment is a set of pure functions over an immutable array
``State`` PyTree: ``init``, ``reset``, ``step``, ``observe``.  A single
environment instance is batch-free; batch simulation is ``jax.vmap`` over the
state, and distribution is sharding the batch axis over a device mesh.
"""

from marl_dmfb_tpu.envs import dmfb, meda
from marl_dmfb_tpu.envs.registry import make_env, get_env_info

__all__ = ["dmfb", "meda", "make_env", "get_env_info"]
