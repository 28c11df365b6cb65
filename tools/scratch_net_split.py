"""Scratch: split CRNN forward cost (encode convs vs GRU vs head) at
rollout shapes on the real TPU."""
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
from marl_dmfb_tpu.utils.benchmarking import timeit_chained

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
theta = lstate.params["agent"]
N, A, T = env.n_agents, env.n_actions, env.episode_limit
H = args.rnn_hidden_dim
rows = B * N
D = args.obs_shape[-1] + A

x0 = jax.random.uniform(jax.random.PRNGKey(3), (rows, D))
h0 = jnp.zeros((rows, H), jnp.float32)


def scan_of(fn, carry0, label):
    @jax.jit
    def run(c):
        def step(c, _):
            return fn(c), 0.0
        cf, _ = jax.lax.scan(step, c, None, length=T)
        return {"c": cf}

    def bstep(i, carry):
        c = carry["c"] if isinstance(carry, dict) else carry
        return run(c)

    sec = timeit_chained(bstep, carry0, iters=10)
    print(f"{label}: {sec*1000:.1f} ms for T={T}")
    return sec


# full forward
def full(c):
    h = c
    q, h2 = net.apply({"params": theta}, x0, h)
    return h2


scan_of(full, h0, "full forward")


# encode only (convs + vec mlp); carry a dummy f32 scalar mixed with output
def enc(c):
    e = net.apply({"params": theta}, x0 + c[..., :1] * 0, method="encode")
    return e[..., :H] * 0 + c + e.sum(-1, keepdims=True) * 1e-20


scan_of(enc, h0, "encode only")


# gru + head only on fixed encoded input
e0 = net.apply({"params": theta}, x0, method="encode")


def gru(c):
    h2 = net.apply({"params": theta}, e0, c, method="gru_step")
    q = net.apply({"params": theta}, h2, method="q_head")
    return h2 + q.sum(-1, keepdims=True) * 1e-20


scan_of(gru, h0, "gru+head only")
