"""Phase-level profile of one collect+learn training cycle on the TPU.

Times each phase of the cycle separately (fused rollout / replay store /
sample / TD learn step, with the learn step further split into
forward-only vs forward+backward) and reports analytic model-FLOP
utilisation for the phases that are matmul/conv dominated.  Optionally
captures a ``jax.profiler`` trace for offline inspection.

Usage:
    python profile_cycle.py [B] [compute_dtype] [--trace=/tmp/trace]
                            [--actor_split]   # decompose the fused rollout
                                              # into env / net / glue phases

Prints one JSON line per phase.  This is the evidence behind the
"speed-of-light" per-chip claims (see RESULTS.md, Profiling section).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.rollout import make_rollout
from bench_train import estimate_learn_flops


def timed(fn, *a, iters=10):
    """Host-read-synced timing (see utils/benchmarking.timeit_dispatch)."""
    from marl_dmfb_tpu.utils.benchmarking import timeit_dispatch

    return timeit_dispatch(fn, *a, iters=iters, warmup=1)


def emit(metric, ms, note=""):
    print(json.dumps({"metric": metric, "value": round(ms * 1000, 3),
                      "unit": "ms" + (f" ({note})" if note else ""),
                      "vs_baseline": None}), flush=True)


def main(B=1024, compute_dtype="float32", trace_dir="", scan_unroll=0,
         actor_split=False):
    # scan_unroll=0 (auto: full unroll at T<=64) matches the trainer's
    # default, so the profiled learn step is the one train.py actually runs.
    args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10,
                n_parallel_envs=B, compute_dtype=compute_dtype,
                scan_unroll=scan_unroll)
    args.apply_env_defaults()
    args.load_yaml()
    env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
    args.update_env_info(env.env_info())
    init, learn, net, learn_many, loss_fn = make_learner(args, env)
    lstate = init(jax.random.PRNGKey(0))
    rollout = make_rollout(env, net, args.rnn_hidden_dim)
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
    rb = replay_lib.init_replay(
        capacity=args.buffer_size, episode_limit=args.episode_limit,
        n_agents=args.n_agents, obs_dim=args.obs_shape[-1],
        n_actions=args.n_actions,
    )
    T = env.episode_limit

    def roll(st, key):
        return rollout(lstate.params["agent"], st, key, jnp.float32(1.0),
                       jnp.float32(0.0), jnp.float32(0.05), greedy=False)

    from marl_dmfb_tpu.utils.benchmarking import hostread

    res = roll(states, jax.random.PRNGKey(2))
    hostread(res.episodes["r"])
    # store donates rb; re-init per timing call is wrong, so time it on
    # fresh copies via a jitted non-donating wrapper
    store_nodonate = jax.jit(lambda rb, ep: replay_lib.store(rb, ep))
    rb = replay_lib.store(rb, res.episodes)

    dt_roll, res = timed(lambda k: roll(res.env_states, k),
                         jax.random.PRNGKey(3), iters=5)
    sps = f"{round(B * T / dt_roll):,}".replace(",", " ")
    emit("rollout_ms", dt_roll, f"B={B}, T={T} -> {sps} env-steps/s")

    # per-sample net-forward FLOPs = learn FLOPs / (4 streams) scaled to
    # the rollout's B*N*T forward passes
    f_learn = estimate_learn_flops(args)
    per_sample = f_learn / 4.0 / (args.batch_size * args.n_agents
                                  * args.episode_limit)
    f_roll = per_sample * B * args.n_agents * T
    print(json.dumps({
        "metric": "rollout_net_tflops",
        "value": round(f_roll / dt_roll / 1e12, 2),
        "unit": f"TFLOP/s analytic net-forward ({compute_dtype})",
        "vs_baseline": round(f_roll / dt_roll / 1e12 / 197.0, 4),
    }), flush=True)

    if actor_split:
        # Decompose the fused rollout: (a) env step+obs only (random
        # actions, no net), (b) net forward only (T-step scan over fixed
        # obs).  The residual vs the full rollout is scan glue (eps
        # sampling, live-masking, transition writes, o_ext concat).
        N, A = env.n_agents, env.n_actions

        @jax.jit
        def env_only(env_states, key):
            env_states = jax.vmap(lambda s: env.reset(s, new=False))(
                env_states)

            def step_fn(carry, _):
                st, k = carry
                k, k_a = jax.random.split(k)
                a = jax.random.randint(k_a, (B, N), 0, A, jnp.int32)
                st2, out = jax.vmap(env.step)(st, a)
                return (st2, k), out.team_reward

            (stf, _), rews = jax.lax.scan(
                step_fn, (env_states, key), None, length=T)
            return stf, rews.sum()

        dt_env, _ = timed(lambda k: env_only(res.env_states, k),
                          jax.random.PRNGKey(7), iters=5)
        emit("rollout_env_only_ms", dt_env,
             f"env step+obs, random actions; {dt_env/dt_roll:.0%} of full")

        from marl_dmfb_tpu.models.networks import build_agent_net

        agent_net = build_agent_net(args)
        obs0 = jax.vmap(env.observe)(res.env_states)
        x0 = jnp.concatenate(
            [obs0.astype(jnp.float32),
             jnp.zeros((B, N, A), jnp.float32)], -1
        ).reshape(B * N, -1)
        theta = lstate.params["agent"]

        @jax.jit
        def net_only(h0):
            def step_fn(h, _):
                q, h2 = agent_net.apply({"params": theta}, x0, h)
                return h2, ()

            hf, _ = jax.lax.scan(step_fn, h0, None, length=T)
            return hf.sum()

        h0 = jnp.zeros((B * N, args.rnn_hidden_dim), jnp.float32)
        dt_net, _ = timed(net_only, h0, iters=5)
        emit("rollout_net_only_ms", dt_net,
             f"T={T} CRNN forwards; {dt_net/dt_roll:.0%} of full")
        emit("rollout_glue_ms", max(0.0, dt_roll - dt_env - dt_net),
             "derived residual: full - env - net")

    dt_store, _ = timed(store_nodonate, rb, res.episodes, iters=10)
    emit("replay_store_ms", dt_store, f"B={B} episodes")

    sample = jax.jit(lambda key: replay_lib.sample(rb, key, args.batch_size))
    dt_sample, batch = timed(sample, jax.random.PRNGKey(4), iters=10)
    emit("replay_sample_ms", dt_sample, f"batch={args.batch_size}")

    dt_learn, _ = timed(lambda: learn(lstate, batch), iters=50)
    emit("learn_step_ms", dt_learn,
         f"batch={args.batch_size}, T={args.episode_limit} BPTT")

    # forward-only: the TD loss without the backward pass
    loss_only = jax.jit(lambda ls, b: loss_fn(
        ls.params, ls.target_params, b))
    dt_fwd, _ = timed(loss_only, lstate, batch, iters=50)
    emit("learn_forward_only_ms", dt_fwd, "loss eval, no grad")
    emit("learn_backward_ms", dt_learn - dt_fwd, "derived: step - fwd")

    tflops = f_learn / dt_learn / 1e12
    print(json.dumps({
        "metric": "learn_step_tflops",
        "value": round(tflops, 2),
        "unit": f"TFLOP/s analytic ({compute_dtype}); "
                "v5e peak ~197 bf16 / ~49 f32",
        "vs_baseline": round(tflops / 197.0, 4),
    }), flush=True)

    updates = max(1, round(args.train_time * B / args.n_episodes))
    key = jax.random.PRNGKey(5)
    dt_many, _ = timed(
        lambda: learn_many(lstate, rb.data, rb.size, key, updates), iters=3)
    emit("learn_many_ms", dt_many, f"{updates} fused updates")

    if trace_dir:
        # hostread, not block_until_ready: the latter can return before the
        # remote execution finishes (CLAUDE.md), truncating the trace.
        with jax.profiler.trace(trace_dir):
            r2 = roll(res.env_states, jax.random.PRNGKey(6))
            hostread(r2.episodes["r"])
            ls2, loss = learn(lstate, batch)
            hostread(loss)
        print(json.dumps({"metric": "trace_dir", "value": trace_dir,
                          "unit": "jax.profiler trace (tensorboard)",
                          "vs_baseline": None}), flush=True)


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    tr = next((a.split("=", 1)[1] for a in sys.argv[1:]
               if a.startswith("--trace=")), "")
    su = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
               if a.startswith("--scan_unroll=")), 0)
    main(B=int(pos[0]) if pos else 1024,
         compute_dtype=pos[1] if len(pos) > 1 else "float32",
         trace_dir=tr, scan_unroll=su,
         actor_split="--actor_split" in sys.argv[1:])
