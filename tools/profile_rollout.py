"""Trace the fused rollout and print the top device ops by total duration.

Captures a ``jax.profiler`` trace of 3 chained rollouts at the headline
config (DMFB 10x10-4d fov9, B from argv) on the real TPU and aggregates
per-op device time from the xplane with ``jax.profiler.ProfileData`` — the
op-level view behind RESULTS.md's "Actor roofline" trace paragraph.
(The reference has no profiling tooling at all, SURVEY §5; its only
instrumentation is wall-clock spans in train.py:145-158.)

Async copy spans overlap compute, so the per-op totals are occupancy, not
critical path — read them as "what the device spends lines on", and the
jit_rollout line as the true wall time.

Usage: python profile_rollout.py [B] [trace_dir]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rollout_trace"

args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10,
            n_parallel_envs=B)
args.apply_env_defaults()
args.load_yaml()
env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
args.update_env_info(env.env_info())
init, _, net, _, _ = make_learner(args, env)
theta = init(jax.random.PRNGKey(0)).params["agent"]
rollout = make_rollout(env, net, args.rnn_hidden_dim)
states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))

res = rollout(theta, states, jax.random.PRNGKey(2), jnp.float32(1.0),
              jnp.float32(0.0), jnp.float32(0.05), greedy=False)
jax.block_until_ready(res.episodes["r"])

import time

with jax.profiler.trace(trace_dir):
    for i in range(3):
        res = rollout(theta, res.env_states, jax.random.PRNGKey(3 + i),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
    jax.block_until_ready(res.episodes["r"])
    time.sleep(1)

import glob
from collections import defaultdict

from jax.profiler import ProfileData

paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
pd = ProfileData.from_file(paths[-1])
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    print("PLANE:", plane.name)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name] += ev.duration_ns
            cnt[ev.name] += 1
    total = sum(tot.values())
    print(f"total device-op occupancy (3 rollouts, all lines): "
          f"{total / 1e6:.1f} ms")
    for name, ns in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ns / 1e6:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")
