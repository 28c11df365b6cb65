"""Fused DMFB environment step as a single Pallas TPU kernel.

The XLA env step lowers to hundreds of small VPU HLOs per scan iteration
(sequential droplet moves, pairwise conflicts, wear update, three FOV
observation layers per agent); per-op scheduling overhead dominates at
large batch.  This kernel computes the ENTIRE transition — moves,
conflicts, rewards, usage wear, observations, episode bookkeeping — in one
``pallas_call`` over a batch-tiled grid, with everything vectorized over
the batch lane dimension and small static Python loops over the (<= ~10)
droplets.

Semantics are identical to :func:`marl_dmfb_tpu.envs.dmfb.step_core`
(which is lockstep-verified against the reference simulator); the
equivalence is asserted by tests/test_pallas_step.py over random states,
so this kernel inherits the reference parity.

Layout notes (TPU):
* per-env boards are flattened to ``(Bt, W*L)`` — lookups are one-hot
  multiply+reduce on the VPU, never gathers;
* all iota is 2-D ``broadcasted_iota``; every intermediate stays 2-D;
* the observation output is ``(Bt, N * obs_dim)`` int8.

STATUS: semantics verified (interpret-mode equivalence tests); on this
machine's tunneled-TPU remote compile service, Mosaic compilation of the
full fused kernel does not complete in reasonable time, so the XLA step
(which already sustains ~3M env-steps/s) remains the default engine.  On a
directly attached TPU, compile and benchmark via tests/test_pallas_step.py
and bench.py before switching the rollout engine.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marl_dmfb_tpu.envs import dmfb as denv
from marl_dmfb_tpu.envs.dmfb import DMFBParams, DMFBState, StepOutput


def _round_half_even(x):
    # jnp.round is round-half-even, matching the reference's Python round()
    return jnp.round(x)


def _make_kernel(params: DMFBParams):
    W, L, N, fov = params.width, params.length, params.n_droplets, params.fov
    hf = fov // 2
    WL = W * L
    F2 = fov * fov
    obs_dim = 3 * F2 + 2
    stall = params.stall

    def kernel(pos_ref, dist_ref, goal_ref, health_ref, usage_ref, block_ref,
               act_ref, uni_ref, step_ref, cumc_ref,
               # outputs
               pos_o, dist_o, usage_o, step_o, cumc_o, rew_o, obs_o,
               done_o, term_o, cons_o, succ_o, team_o):
        # Mosaic layout note: every intermediate stays 2-D — per-droplet
        # scalars are (Bt, 1) columns (1-D vectors trip TPU layout checks).
        Bt = pos_ref.shape[0]
        cell_iota = lax.broadcasted_iota(jnp.int32, (Bt, WL), 1)

        health = health_ref[:]           # (Bt, WL)
        block = block_ref[:]             # (Bt, WL) f32 0/1

        col = lambda ref, i: ref[:, i : i + 1]          # (Bt, 1)
        px = [col(pos_ref, 2 * i) for i in range(N)]
        py = [col(pos_ref, 2 * i + 1) for i in range(N)]
        gx = [col(goal_ref, 2 * i) for i in range(N)]
        gy = [col(goal_ref, 2 * i + 1) for i in range(N)]
        dist = [col(dist_ref, i) for i in range(N)]
        act = [col(act_ref, i) for i in range(N)]
        uni = [col(uni_ref, i) for i in range(N)]

        dones_pre = [d == 0 for d in dist]
        past_x = list(px)
        past_y = list(py)
        rewards = []

        # --- sequential droplet moves (dmfb.py:325-359) ---
        for i in range(N):
            d_old = dist[i]
            already = jnp.logical_and(bool(stall), d_old == 0)
            cell = px[i] * L + py[i]
            onehot = (cell_iota == cell).astype(jnp.float32)
            prob = jnp.sum(health * onehot, axis=1, keepdims=True)
            moved = jnp.logical_and(~already, uni[i] <= prob)
            a = act[i]
            dx = (a == 1).astype(jnp.int32) - (a == 2).astype(jnp.int32)
            dy = (a == 4).astype(jnp.int32) - (a == 3).astype(jnp.int32)
            cx = jnp.clip(px[i] + dx, 0, W - 1)
            cy = jnp.clip(py[i] + dy, 0, L - 1)
            conehot = (cell_iota == (cx * L + cy)).astype(jnp.float32)
            on_block = jnp.sum(block * conehot, axis=1, keepdims=True) > 0.5
            cx = jnp.where(on_block, px[i], cx)
            cy = jnp.where(on_block, py[i], cy)
            occupied = jnp.zeros_like(on_block)
            for j in range(N):
                if j != i:
                    occupied = occupied | ((px[j] == cx) & (py[j] == cy))
            cx = jnp.where(occupied, px[i], cx)
            cy = jnp.where(occupied, py[i], cy)
            nx = jnp.where(moved, cx, px[i])
            ny = jnp.where(moved, cy, py[i])
            px[i], py[i] = nx, ny
            d_new = jnp.abs(nx - gx[i]) + jnp.abs(ny - gy[i])
            r = jnp.where(
                (d_new == d_old) & (d_old == 0), -0.1,
                jnp.where((d_new == d_old) & (a == 0), -0.25,
                          jnp.where(d_new < d_old, -0.1, -0.4)),
            )
            rewards.append(jnp.where(already, 0.0, r))
            dist[i] = jnp.where(already, d_old, d_new)

        # --- conflicts (dmfb.py:254-271) ---
        sta = [jnp.zeros_like(rewards[0]) for _ in range(N)]
        dy_c = [jnp.zeros_like(rewards[0]) for _ in range(N)]
        for i in range(N):
            for j in range(N):
                if i == j:
                    continue
                close_cc = ((px[i] - px[j]) ** 2 + (py[i] - py[j]) ** 2) < 4
                sta[i] = sta[i] + close_cc.astype(jnp.float32)
                close_pc = ((past_x[i] - px[j]) ** 2
                            + (past_y[i] - py[j]) ** 2) < 4
                dy_c[i] = dy_c[i] + close_pc.astype(jnp.float32)
                dy_c[j] = dy_c[j] + close_pc.astype(jnp.float32)
        constraints = sum(sta) + sum(dy_c)                   # (Bt, 1)

        all_done = dist[0] == 0
        for i in range(1, N):
            all_done = all_done & (dist[i] == 0)
        bonus = jnp.where(all_done,
                          jnp.where(constraints == 0.0, 20.0, 10.0), 0.0)
        for i in range(N):
            r = rewards[i] - 2.0 * sta[i] - 2.0 * dy_c[i]
            if stall:
                r = jnp.where(dones_pre[i], 0.0, r)
            rewards[i] = r + bonus

        # --- bookkeeping + wear (dmfb.py:459-463, 560-587) ---
        step_count = step_ref[:] + 1                         # (Bt, 1)
        wear = jnp.zeros((Bt, WL), jnp.float32)
        for i in range(N):
            onehot = (cell_iota == (px[i] * L + py[i])).astype(jnp.float32)
            wear = wear + onehot * (dist[i] != 0).astype(jnp.float32)
        usage_o[:] = usage_ref[:] + wear
        cumc = cumc_ref[:] + constraints.astype(jnp.int32)
        within = step_count < params.max_step
        success = (within & all_done & (cumc == 0)).astype(jnp.int32)
        dones_now = []
        terminated = None
        for i in range(N):
            done_i = (dist[i] == 0) | ~within
            dones_now.append(done_i.astype(jnp.int32))  # concat bools trips Mosaic
            terminated = done_i if terminated is None else terminated & done_i
        team = sum(rewards)
        pos_o[:] = jnp.concatenate(
            [c for i in range(N) for c in (px[i], py[i])], axis=1
        )
        dist_o[:] = jnp.concatenate(dist, axis=1)
        rew_o[:] = jnp.concatenate(rewards, axis=1)
        done_o[:] = jnp.concatenate(dones_now, axis=1).astype(jnp.int8)
        step_o[:] = step_count
        cumc_o[:] = cumc
        cons_o[:] = constraints.astype(jnp.int32)
        succ_o[:] = success
        term_o[:] = terminated.astype(jnp.int32).astype(jnp.int8)
        team_o[:] = team / N

        # --- observations (dmfb.py:394-457): 3 layers + zoomed direction ---
        f_iota = lax.broadcasted_iota(jnp.int32, (Bt, F2), 1)
        f_r = f_iota // fov
        f_c = f_iota % fov
        agent_obs = []
        for i in range(N):
            ox = px[i] - hf                                  # (Bt, 1)
            oy = py[i] - hf
            layer0 = jnp.zeros((Bt, F2), jnp.int32)
            layer1 = jnp.zeros((Bt, F2), jnp.int32)
            for j in range(N):
                m0 = (f_r == px[j] - ox) & (f_c == py[j] - oy)
                layer0 = jnp.maximum(layer0, m0.astype(jnp.int32) * (j + 1))
                visible = (
                    (jnp.abs(px[j] - px[i]) <= hf)
                    & (jnp.abs(py[j] - py[i]) <= hf)
                ) if j != i else None
                if visible is not None:
                    g1x = jnp.clip(gx[j] - ox, 0, fov - 1)
                    g1y = jnp.clip(gy[j] - oy, 0, fov - 1)
                    m1 = (f_r == g1x) & (f_c == g1y) & visible
                    layer1 = jnp.maximum(
                        layer1, m1.astype(jnp.int32) * (j + 1)
                    )
            # layer2: blocks at ABSOLUTE coords [0,fov) (reference quirk);
            # fov <= min(W, L) so the window is in-board: assemble rows of
            # the block board by static concatenation
            rows_ = [block[:, r_ * L : r_ * L + fov] for r_ in range(fov)]
            layer2 = (jnp.concatenate(rows_, axis=1) > 0.5).astype(jnp.int32)
            # boundary bars overwrite
            abs_r = f_r + ox
            abs_c = f_c + oy
            bad = (abs_r < 0) | (abs_r > W - 1) | (abs_c < 0) | (abs_c > L - 1)
            layer2 = jnp.where(bad, 1, layer2)

            # direction vector with zoom (dmfb.py:441-453)
            def zoom(d, extent):
                scale = (extent - hf) / (10 - hf)
                pos_z = _round_half_even((d - hf) / scale).astype(jnp.int32) + hf
                neg_z = _round_half_even((d + hf) / scale).astype(jnp.int32) - hf
                return jnp.where(jnp.abs(d) > hf,
                                 jnp.where(d > 0, pos_z, neg_z), d)

            drx = zoom(gx[i] - px[i], W)
            dry = zoom(gy[i] - py[i], L)
            agent_obs.append(jnp.concatenate(
                [layer0, layer1, layer2, drx, dry], axis=1,
            ).astype(jnp.int8))
        obs_o[:] = jnp.concatenate(agent_obs, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def pallas_step_batch(params: DMFBParams, state: DMFBState, actions, uniforms):
    """Batched DMFB transition via the fused kernel.

    ``state`` is a BATCHED DMFBState (leading axis B); returns
    (new_state, StepOutput) with the same contents as
    ``vmap(dmfb.step_core)``.  PRNG handling (key split / uniforms) happens
    outside, like ``step_core``.
    """
    B = state.pos.shape[0]
    W, L, N = params.width, params.length, params.n_droplets
    WL = W * L
    obs_dim = params.obs_dim
    kernel = _make_kernel(params)

    pos = state.pos.reshape(B, 2 * N)
    goal = state.goal.reshape(B, 2 * N)
    health = state.health.reshape(B, WL)
    usage = state.usage.reshape(B, WL)
    block = state.block_mask.reshape(B, WL).astype(jnp.float32)

    out_shapes = (
        jax.ShapeDtypeStruct((B, 2 * N), jnp.int32),   # pos
        jax.ShapeDtypeStruct((B, N), jnp.int32),       # dist
        jax.ShapeDtypeStruct((B, WL), jnp.float32),    # usage
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # step_count
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # cum_constraints
        jax.ShapeDtypeStruct((B, N), jnp.float32),     # rewards
        jax.ShapeDtypeStruct((B, N * obs_dim), jnp.int8),  # obs
        jax.ShapeDtypeStruct((B, N), jnp.int8),        # dones
        jax.ShapeDtypeStruct((B, 1), jnp.int8),        # terminated
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # constraints
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # success
        jax.ShapeDtypeStruct((B, 1), jnp.float32),     # team reward
    )
    specs = lambda n: [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]
    (pos2, dist2, usage2, step2, cumc2, rew, obs_flat, dones, term, cons,
     succ, team) = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=specs(10),
        out_specs=tuple(specs(12)),
    )(pos, state.dist, goal, health, usage, block,
      actions.astype(jnp.int32), uniforms,
      state.step_count.reshape(B, 1), state.cum_constraints.reshape(B, 1))

    new_state = state._replace(
        pos=pos2.reshape(B, N, 2),
        dist=dist2,
        usage=usage2.reshape(B, W, L),
        step_count=step2[:, 0],
        cum_constraints=cumc2[:, 0],
    )
    out = StepOutput(
        obs=obs_flat.reshape(B, N, obs_dim),
        rewards=rew,
        team_reward=team[:, 0],
        dones=dones.astype(bool),
        terminated=term[:, 0].astype(bool),
        constraints=cons[:, 0],
        success=succ[:, 0],
    )
    return new_state, out


def pallas_step_with_key(params: DMFBParams, state: DMFBState, actions):
    """Like vmap(dmfb.step): draws per-droplet uniforms from state.key."""
    def draw(key):
        k2, sub = jax.random.split(key)
        return k2, jax.random.uniform(sub, (params.n_droplets,))

    keys, uniforms = jax.vmap(draw)(state.key)
    state = state._replace(key=keys)
    return pallas_step_batch(params, state, actions, uniforms)
