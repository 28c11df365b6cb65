"""Throughput benchmark: full actor loop (obs -> CRNN forward -> eps-greedy
-> env step) on DMFB 10x10, 4 droplets, fov 9 — the BASELINE.json headline
config.  Prints ONE JSON line.

Usage: python bench.py [B] [n_blocks] [env] [dtype]
  env = dmfb (default) or meda (30x60, 4 droplets, fov 19, v0.2 obs).
  dtype = float32 (default, parity) or bf16 (MXU-native net forward).

The reference never recorded throughput (SURVEY §6); BASELINE.json's
north-star target is >= 1e6 env-steps/s per host on this config, which is
used as the baseline denominator.
"""

import json
import sys

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp


def main():
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.config import Args, make_env_from_args

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    env_name = sys.argv[3] if len(sys.argv) > 3 else "dmfb"
    dtype = sys.argv[4] if len(sys.argv) > 4 else "float32"

    if env_name == "meda":
        if n_blocks:
            raise SystemExit("bench.py: meda has no obstacle blocks; "
                             "n_blocks must be 0")
        args = Args(name="meda", drop_num=4, n_parallel_envs=B,
                    compute_dtype=dtype)
    else:
        args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10,
                    n_parallel_envs=B, block_num=n_blocks,
                    compute_dtype=dtype)
    args.apply_env_defaults()
    args.load_yaml()
    env = make_env_from_args(args)
    args.update_env_info(env.env_info())

    init, _, net, _, _ = make_learner(args, env)
    lstate = init(jax.random.PRNGKey(0))
    from marl_dmfb_tpu.rollout import make_rollout

    rollout = make_rollout(env, net, args.rnn_hidden_dim)
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))

    def run(states, key):
        return rollout(lstate.params["agent"], states, key,
                       jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                       greedy=False)

    # Timing methodology: block_until_ready over the axon tunnel can return
    # before remote execution finishes, so the timed region ends with a host
    # read and subtracts one RTT (utils/benchmarking.timeit_chained);
    # iterations are chained through env_states so nothing can overlap out
    # of order.
    from marl_dmfb_tpu.utils.benchmarking import timeit_chained

    def bench_step(i, carry):
        st = carry.env_states if hasattr(carry, "env_states") else carry
        return run(st, jax.random.PRNGKey(2 + i))

    T = env.episode_limit
    sec = timeit_chained(bench_step, states, iters=10)

    sps = B * T / sec  # lockstep steps x batch per iteration
    metric = ("actor_env_steps_per_sec" if env_name == "dmfb"
              else f"actor_env_steps_per_sec_{env_name}")
    if n_blocks:
        metric += f"_blocks{n_blocks}"  # keep the 0-block headline distinct
    if dtype != "float32":
        metric += f"_{dtype}"
    print(json.dumps({
        "metric": metric,
        "value": round(sps),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / 1e6, 4),
    }))


if __name__ == "__main__":
    main()
