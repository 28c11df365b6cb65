"""Pallas-vs-XLA wall-clock for the fused DMFB step kernel on the real TPU.

Prints compile time and per-step latency for both implementations (the
kernel measured 1.42x slower than XLA at B=1024 on an idle v5e; see
RESULTS.md, Profiling). Usage: python bench_pallas.py"""
import time

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.envs.dmfb import step_core
from marl_dmfb_tpu.ops.dmfb_step_pallas import pallas_step_batch
# host-read sync + RTT subtraction: block_until_ready over the axon tunnel
# can return early (utils/benchmarking.py)
from marl_dmfb_tpu.utils.benchmarking import hostread, timeit_dispatch

B = 1024
env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
params = env.params
states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(0), B))
actions = jax.random.randint(jax.random.PRNGKey(1), (B, 4), 0, 5)
uniforms = jax.random.uniform(jax.random.PRNGKey(2), (B, 4))

print("compiling pallas kernel...", flush=True)
t0 = time.perf_counter()
fn = jax.jit(lambda s, a, u: pallas_step_batch(params, s, a, u))
out = fn(states, actions, uniforms)
hostread(out)
t_compile = time.perf_counter() - t0
print(f"pallas compile+first-run: {t_compile:.1f}s", flush=True)

t_pallas, _ = timeit_dispatch(fn, states, actions, uniforms, iters=100)
print(f"pallas step: {t_pallas*1000:.3f} ms", flush=True)

# XLA baseline: same single-step transition
def xla_step(s, a, u):
    return step_core(params, s, a, u)

fx = jax.jit(jax.vmap(xla_step))
t_xla, _ = timeit_dispatch(fx, states, actions, uniforms, iters=100)
print(f"xla   step: {t_xla*1000:.3f} ms  (pallas/xla = {t_pallas/t_xla:.2f})",
      flush=True)
