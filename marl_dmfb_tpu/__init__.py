"""marl_dmfb_tpu — a TPU-native (JAX/XLA/pjit) multi-agent RL framework for
droplet routing on digital microfluidic biochips.

Re-designed from scratch with the capabilities of the reference MARL-DMFB
framework (see /root/reference): DMFB and MEDA routing environments, VDN/QMIX
value-decomposition learners over shared conv-GRU agent networks, episode
replay, electrode-degradation modelling, and evaluation/degradation-sweep
workloads — all built TPU-first:

* environments are pure functions over array PyTrees, `vmap`-ed over
  thousands of chip instances and `jit`-compiled (no Python object state),
* rollouts are `lax.scan` loops that keep the whole actor loop
  (obs -> net -> action -> env step) resident on device,
* the replay buffer is a device-resident ring buffer,
* learning is a single jitted TD step with scan-unrolled GRU BPTT,
* scale-out is a `jax.sharding.Mesh` with the env batch sharded across
  chips/hosts and parameters replicated (XLA collectives over ICI).
"""

__version__ = "0.1.0"
