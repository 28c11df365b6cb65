"""Scratch A/B (VERDICT r4 #9 / RESULTS "Actor roofline" closing note):
the one obs encoding never measured — replace layer0's per-observer
(N,fov,fov) comparison build (O(N^2 fov^2) per env-step) with a per-step
painted (W,L) id board contracted per observer against one-hot row/col
window matrices (two small matmuls, no gathers).

Layers 1 (visible-goal ids, per-observer clipping) and 2 (blocks +
boundary) keep the shipped construction — layer 1's clip-into-window
semantics (reference dmfb.py:415-420) are inherently per-observer, so the
painting idea only applies to layer 0.

Protocol matches the other six A/Bs: (1) exact-equality check vs the
shipped observe on random reachable states (CPU), (2) fused-rollout
throughput on the real TPU at the headline config, painted vs shipped.

Usage: python tools/scratch_painted_obs.py [check|bench] [B]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

from marl_dmfb_tpu.utils import apply_platform_env

mode = sys.argv[1] if len(sys.argv) > 1 else "check"
if mode == "check":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu.envs import dmfb as D
from marl_dmfb_tpu.envs import make_env


def observe_painted(params, state):
    """Alternative v0 observe: painted-board layer 0."""
    fov, hf = params.fov, params.fov // 2
    n, w, l = params.n_droplets, params.width, params.length

    # one painted (W, L) id board per step (droplet cells are unique,
    # so the einsum-sum is exact), f32 for the MXU
    xs, ys = jnp.arange(w), jnp.arange(l)
    ox = (state.pos[:, 0:1] == xs[None, :]).astype(jnp.float32)   # (n, w)
    oy = (state.pos[:, 1:2] == ys[None, :]).astype(jnp.float32)   # (n, l)
    ids = jnp.arange(1, n + 1, dtype=jnp.float32)
    board = jnp.einsum("nw,nl,n->wl", ox, oy, ids)                # (w, l)

    # per-observer one-hot window matrices: R[i, r, x] = (x == cx_i-hf+r)
    rows = jnp.arange(fov)
    rx = state.pos[:, 0, None, None] - hf + rows[None, :, None]   # (n,fov,1)
    ry = state.pos[:, 1, None, None] - hf + rows[None, :, None]
    R = (rx == xs[None, None, :]).astype(jnp.float32)             # (n,fov,w)
    C = (ry == ys[None, None, :]).astype(jnp.float32)             # (n,fov,l)
    layer0 = jnp.einsum("ifw,wl,igl->ifg", R, board, C).astype(jnp.int8)

    def rest(i, l0):
        cx, cy = state.pos[i, 0], state.pos[i, 1]
        js = jnp.arange(n)
        visible = (
            (js != i)
            & (jnp.abs(state.pos[:, 0] - cx) <= hf)
            & (jnp.abs(state.pos[:, 1] - cy) <= hf)
        )
        gx = jnp.clip(state.goal[:, 0] - (cx - hf), 0, fov - 1)
        gy = jnp.clip(state.goal[:, 1] - (cy - hf), 0, fov - 1)
        cell = (rows[None, :, None] == gx[:, None, None]) & (
            rows[None, None, :] == gy[:, None, None]
        )
        ids1 = ((js + 1) * visible).astype(jnp.int8)
        layer1 = jnp.max(cell * ids1[:, None, None], axis=0).astype(jnp.int8)
        layer2 = state.block_mask[:fov, :fov].astype(jnp.int8)
        layer2 = D._boundary_overlay(params, layer2, cx, cy)
        drx = D._zoom_dir(params, state.goal[i, 0] - cx, params.width)
        dry = D._zoom_dir(params, state.goal[i, 1] - cy, params.length)
        direction = jnp.stack([drx, dry]).astype(jnp.int8)
        pixel = jnp.stack([l0, layer1, layer2]).astype(jnp.int8)
        return jnp.concatenate([pixel.reshape(-1), direction])

    return jax.vmap(rest)(jnp.arange(n), layer0)


def check():
    import numpy as np

    for (w, l, n, fov) in ((10, 10, 4, 9), (20, 20, 10, 9), (5, 5, 2, 5),
                           (30, 30, 4, 9)):
        env = make_env("dmfb", width=w, length=l, n_droplets=n, fov=fov)
        key = jax.random.PRNGKey(0)
        st = jax.vmap(env.init)(jax.random.split(key, 64))
        # walk some steps so positions decorrelate from starts
        for t in range(12):
            k = jax.random.fold_in(key, t)
            a = jax.random.randint(k, (64, n), 0, 5, jnp.int32)
            st, _ = jax.vmap(env.step)(st, a)
        ref = jax.vmap(lambda s: D.observe(env.params, s))(st)
        alt = jax.vmap(lambda s: observe_painted(env.params, s))(st)
        assert np.array_equal(np.asarray(ref), np.asarray(alt)), (w, l, n)
        print(f"{w}x{l}-{n}d fov{fov}: painted == shipped (exact)")


def bench(B, w=10, n=4):
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.config import Args
    from marl_dmfb_tpu.rollout import make_rollout
    from marl_dmfb_tpu.utils.benchmarking import timeit_chained

    args = Args(name="dmfb", drop_num=n, fov=9, width=w, length=w,
                n_parallel_envs=B)
    args.apply_env_defaults()
    args.load_yaml()
    env = make_env("dmfb", width=w, length=w, n_droplets=n, fov=9)
    args.update_env_info(env.env_info())
    print(f"config {w}x{w}-{n}d fov9, B={B}")
    init, _, net, _, _ = make_learner(args, env)
    theta = init(jax.random.PRNGKey(0)).params["agent"]
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
    T = env.episode_limit

    import functools

    env_painted = env._replace(
        observe=functools.partial(observe_painted, env.params))
    for name, e in (("shipped", env), ("painted", env_painted)):
        rollout = make_rollout(e, net, args.rnn_hidden_dim)

        def step(i, carry):
            st = carry.env_states if hasattr(carry, "env_states") else carry
            return rollout(theta, st, jax.random.PRNGKey(2 + i),
                           jnp.float32(1.0), jnp.float32(0.0),
                           jnp.float32(0.05), greedy=False)

        sec = timeit_chained(step, states, iters=10)
        print(f"{name}: {sec*1000:.1f} ms -> {B*T/sec/1e6:.2f}M steps/s")


if __name__ == "__main__":
    if mode == "check":
        check()
    else:
        bench(int(sys.argv[2]) if len(sys.argv) > 2 else 16384,
              int(sys.argv[3]) if len(sys.argv) > 3 else 10,
              int(sys.argv[4]) if len(sys.argv) > 4 else 4)
