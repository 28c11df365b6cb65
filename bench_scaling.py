"""Scaling-efficiency benchmark: actor-loop throughput vs mesh size.

Runs the fused rollout with the env batch sharded over 1, 2, ..., all
available devices and reports env-steps/s and parallel efficiency for each
mesh size.  On a multi-chip host this measures ICI scaling; on the 1-chip
dev environment it degenerates to the single-chip number; with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` it
demonstrates the sharded program on a virtual 8-device mesh.

Prints one JSON line per mesh size.
"""

import json

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from marl_dmfb_tpu.rollout import make_rollout
from marl_dmfb_tpu.utils.benchmarking import timeit_chained


def main(per_device_b=1024, iters=3):
    env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
    args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10)
    args.apply_env_defaults()
    args.load_yaml()
    args.update_env_info(env.env_info())
    init, _, net, _, _ = make_learner(args, env)
    lst = init(jax.random.PRNGKey(0))
    rollout = make_rollout(env, net, args.rnn_hidden_dim)
    T = env.episode_limit

    n_dev = len(jax.devices())
    sizes = [d for d in [1, 2, 4, 8, 16, 32] if d <= n_dev]
    base_sps = None
    for nd in sizes:
        mesh = make_mesh(jax.devices()[:nd])
        B = per_device_b * nd
        states = shard_batch(mesh, jax.vmap(env.init)(
            jax.random.split(jax.random.PRNGKey(1), B)
        ))
        theta = replicate(mesh, lst.params["agent"])
        # host-read sync + one RTT subtracted: block_until_ready over the
        # axon tunnel can return early (marl_dmfb_tpu/utils/benchmarking.py)
        def bench_step(i, carry, theta=theta):
            st = carry.env_states if hasattr(carry, "env_states") else carry
            return rollout(theta, st, jax.random.PRNGKey(2 + i),
                           jnp.float32(1.0), jnp.float32(0.0),
                           jnp.float32(0.05), greedy=False)

        sps = B * T / timeit_chained(bench_step, states, iters=iters)
        if base_sps is None:
            base_sps = sps
        eff = sps / (base_sps * nd)
        print(json.dumps({
            "metric": f"actor_env_steps_per_sec_{nd}dev",
            "value": round(sps),
            "unit": "env-steps/s",
            "vs_baseline": round(eff, 4),  # parallel efficiency vs 1 device
        }))

    # Sharding-overhead probe: same TOTAL batch unsharded on one device vs
    # sharded over all devices.  On virtual CPU devices (shared physical
    # cores) the per-device efficiency above is core-bound and meaningless;
    # this ratio isolates what the mesh program itself costs (partitioning +
    # collectives) — ~1.0 means the sharded program is as fast as the
    # single-device one on identical hardware resources.
    if n_dev > 1:
        B = per_device_b * n_dev
        states = jax.vmap(env.init)(
            jax.random.split(jax.random.PRNGKey(1), B)
        )

        def timed(st, theta):
            def bench_step(i, carry):
                s = carry.env_states if hasattr(carry, "env_states") else carry
                return rollout(theta, s, jax.random.PRNGKey(2 + i),
                               jnp.float32(1.0), jnp.float32(0.0),
                               jnp.float32(0.05), greedy=False)

            return B * T / timeit_chained(bench_step, st, iters=iters)

        sps_plain = timed(states, lst.params["agent"])
        mesh = make_mesh(jax.devices())
        sps_sharded = timed(shard_batch(mesh, states),
                            replicate(mesh, lst.params["agent"]))
        print(json.dumps({
            "metric": f"sharding_overhead_ratio_{n_dev}dev",
            "value": round(sps_sharded / sps_plain, 4),
            "unit": "sharded/unsharded throughput, same total batch",
            "vs_baseline": round(sps_sharded / sps_plain, 4),
        }))


if __name__ == "__main__":
    import sys

    main(per_device_b=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
