"""Scratch: split actor-loop cost into net forward / env step / obs build.

Times (a) the full fused rollout, (b) a rollout variant with random actions
(no net forward), (c) net forward alone over B*N rows x T steps, on the
real TPU.  Untracked scratch — delete after use.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.rollout import make_rollout
from marl_dmfb_tpu.utils.benchmarking import timeit_chained, hostread

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"

args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10,
            n_parallel_envs=B, compute_dtype=dtype)
args.apply_env_defaults()
args.load_yaml()
env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
args.update_env_info(env.env_info())
init, _, net, _, _ = make_learner(args, env)
lstate = init(jax.random.PRNGKey(0))
rollout = make_rollout(env, net, args.rnn_hidden_dim)
states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
N, A, T = env.n_agents, env.n_actions, env.episode_limit
theta = lstate.params["agent"]


def full_step(i, carry):
    st = carry.env_states if hasattr(carry, "env_states") else carry
    return rollout(theta, st, jax.random.PRNGKey(2 + i),
                   jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                   greedy=False)


sec = timeit_chained(full_step, states, iters=10)
print(f"full rollout: {sec*1000:.1f} ms -> {B*T/sec/1e6:.2f}M steps/s")


# --- env-only rollout: random actions, still builds obs every step ---
@jax.jit
def env_only(env_states, key):
    env_states = jax.vmap(lambda s: env.reset(s, new=False))(env_states)

    def step_fn(carry, _):
        states, k = carry
        k, k_a = jax.random.split(k)
        a = jax.random.randint(k_a, (B, N), 0, A, jnp.int32)
        new_states, out = jax.vmap(env.step)(states, a)
        return (new_states, k), out.team_reward

    (stf, _), rews = jax.lax.scan(step_fn, (env_states, key), None, length=T)
    return {"st": stf, "r": rews}


def env_step_b(i, carry):
    st = carry["st"] if isinstance(carry, dict) else carry
    return env_only(st, jax.random.PRNGKey(2 + i))


sec_env = timeit_chained(env_step_b, states, iters=10)
print(f"env-only (step+obs, no net): {sec_env*1000:.1f} ms "
      f"-> {B*T/sec_env/1e6:.2f}M steps/s")


# --- env step WITHOUT obs build ---
@jax.jit
def env_noobs(env_states, key):
    def step_fn(carry, _):
        states, k = carry
        k, k_a = jax.random.split(k)
        a = jax.random.randint(k_a, (B, N), 0, A, jnp.int32)
        new_states, out = jax.vmap(env.step_core)(states, a) \
            if hasattr(env, "step_core") else jax.vmap(env.step)(states, a)
        return (new_states, k), out.team_reward if hasattr(out, "team_reward") else out[0]

    (stf, _), rews = jax.lax.scan(step_fn, (env_states, key), None, length=T)
    return stf, rews


# --- net-only: scan of T forwards over fixed obs ---
obs0 = jax.vmap(env.observe)(states)


@jax.jit
def net_only(obs, h0):
    x0 = jnp.concatenate(
        [obs.astype(jnp.float32), jnp.zeros((B, N, A), jnp.float32)], -1
    ).reshape(B * N, -1)

    def step_fn(h, _):
        q, h2 = net.apply({"params": theta}, x0, h)
        return h2, jnp.argmax(q, -1)

    hF, acts = jax.lax.scan(step_fn, h0, None, length=T)
    return {"h": hF, "a": acts}


h0 = jnp.zeros((B * N, args.rnn_hidden_dim), jnp.float32)


def net_b(i, carry):
    h = carry["h"] if isinstance(carry, dict) else carry
    return net_only(obs0, h)


sec_net = timeit_chained(net_b, h0, iters=10)
print(f"net-only (T={T} forwards): {sec_net*1000:.1f} ms")
print(f"sum env+net = {(sec_env+sec_net)*1000:.1f} ms vs full {sec*1000:.1f}")
