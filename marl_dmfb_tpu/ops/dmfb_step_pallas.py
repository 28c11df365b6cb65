"""Fused DMFB environment step as a single Pallas TPU kernel.

STATUS (measured round 2, idle v5e, B=1024): compiles on the real TPU in
0.5 s (cached) and runs correctly, but is 1.42x SLOWER than the XLA step
it mirrors (0.130 ms vs 0.092 ms) — XLA's fusion already saturates this
op mix.  Kept as a verified reference kernel (``bench_pallas.py``
reproduces the comparison); the production path is the XLA step.

The XLA env step lowers to hundreds of small VPU HLOs per scan iteration
(sequential droplet moves, pairwise conflicts, wear update, three FOV
observation layers per agent).  This kernel computes the ENTIRE transition
— moves, conflicts, rewards, usage wear, observations, episode bookkeeping
— in one ``pallas_call``, with small static Python loops over the (<= ~10)
droplets.

Semantics are identical to :func:`marl_dmfb_tpu.envs.dmfb.step_core`
(which is lockstep-verified against the reference simulator); the
equivalence is asserted by tests/test_pallas_step.py over random states,
so this kernel inherits the reference parity.

Layout (TPU-critical): BATCH-MINOR — every tensor has the env batch on the
LANE (last) dimension and features on sublanes: per-droplet scalars are
``(1, B)`` rows, boards are ``(W*L, B)``, the FOV canvas is ``(fov^2, B)``.
This keeps every op on full 128-lane registers with one uniform layout
(feature-major ``(B, 1)`` columns force per-op relayouts that Mosaic
compiles pathologically slowly).  Board lookups are one-hot
multiply+reduce — never gathers; all iota is 2-D ``broadcasted_iota``.
The wrapper transposes inputs/outputs (cheap XLA transposes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marl_dmfb_tpu.envs.dmfb import DMFBParams, DMFBState, StepOutput


def _make_kernel(params: DMFBParams):
    W, L, N, fov = params.width, params.length, params.n_droplets, params.fov
    hf = fov // 2
    WL = W * L
    F2 = fov * fov
    stall = params.stall

    def kernel(pos_ref, dist_ref, goal_ref, health_ref, usage_ref, block_ref,
               act_ref, uni_ref, step_ref, cumc_ref,
               # outputs
               pos_o, dist_o, usage_o, step_o, cumc_o, rew_o, obs_o,
               done_o, term_o, cons_o, succ_o, team_o):
        B = pos_ref.shape[1]
        # (WL, B) row-index iota, compared against (1, B) cell ids
        cell_iota = lax.broadcasted_iota(jnp.int32, (WL, B), 0)

        health = health_ref[:]           # (WL, B)
        block = block_ref[:]             # (WL, B) f32 0/1

        row = lambda ref, i: ref[i : i + 1, :]          # (1, B)
        px = [row(pos_ref, 2 * i) for i in range(N)]
        py = [row(pos_ref, 2 * i + 1) for i in range(N)]
        gx = [row(goal_ref, 2 * i) for i in range(N)]
        gy = [row(goal_ref, 2 * i + 1) for i in range(N)]
        dist = [row(dist_ref, i) for i in range(N)]
        act = [row(act_ref, i) for i in range(N)]
        uni = [row(uni_ref, i) for i in range(N)]

        dones_pre = [d == 0 for d in dist]
        past_x = list(px)
        past_y = list(py)
        rewards = []

        # --- sequential droplet moves (dmfb.py:325-359) ---
        for i in range(N):
            d_old = dist[i]
            already = jnp.logical_and(bool(stall), d_old == 0)
            onehot = (cell_iota == px[i] * L + py[i]).astype(jnp.float32)
            prob = jnp.sum(health * onehot, axis=0, keepdims=True)  # (1, B)
            moved = jnp.logical_and(~already, uni[i] <= prob)
            a = act[i]
            dx = (a == 1).astype(jnp.int32) - (a == 2).astype(jnp.int32)
            dy = (a == 4).astype(jnp.int32) - (a == 3).astype(jnp.int32)
            cx = jnp.clip(px[i] + dx, 0, W - 1)
            cy = jnp.clip(py[i] + dy, 0, L - 1)
            conehot = (cell_iota == cx * L + cy).astype(jnp.float32)
            on_block = jnp.sum(block * conehot, axis=0, keepdims=True) > 0.5
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
        constraints = sum(sta) + sum(dy_c)                   # (1, B)

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
        step_count = step_ref[:] + 1                         # (1, B)
        wear = jnp.zeros((WL, B), jnp.float32)
        for i in range(N):
            onehot = (cell_iota == px[i] * L + py[i]).astype(jnp.float32)
            wear = wear + onehot * (dist[i] != 0).astype(jnp.float32)
        usage_o[:] = usage_ref[:] + wear
        cumc = cumc_ref[:] + constraints.astype(jnp.int32)
        within = step_count < params.max_step
        success = (within & all_done & (cumc == 0)).astype(jnp.int32)
        dones_now = []
        terminated = None
        for i in range(N):
            done_i = (dist[i] == 0) | ~within
            # concat of i1 vectors trips Mosaic; carry as int32
            dones_now.append(done_i.astype(jnp.int32))
            terminated = done_i if terminated is None else terminated & done_i
        team = sum(rewards)
        pos_o[:] = jnp.concatenate(
            [c for i in range(N) for c in (px[i], py[i])], axis=0
        )
        dist_o[:] = jnp.concatenate(dist, axis=0)
        rew_o[:] = jnp.concatenate(rewards, axis=0)
        done_o[:] = jnp.concatenate(dones_now, axis=0).astype(jnp.int8)
        step_o[:] = step_count
        cumc_o[:] = cumc
        cons_o[:] = constraints.astype(jnp.int32)
        succ_o[:] = success
        term_o[:] = terminated.astype(jnp.int32).astype(jnp.int8)
        team_o[:] = team / N

        # --- observations (dmfb.py:394-457): 3 layers + zoomed direction ---
        f_iota = lax.broadcasted_iota(jnp.int32, (F2, B), 0)
        f_r = f_iota // fov
        f_c = f_iota % fov
        agent_obs = []
        for i in range(N):
            ox = px[i] - hf                                  # (1, B)
            oy = py[i] - hf
            layer0 = jnp.zeros((F2, B), jnp.int32)
            layer1 = jnp.zeros((F2, B), jnp.int32)
            for j in range(N):
                m0 = (f_r == px[j] - ox) & (f_c == py[j] - oy)
                layer0 = jnp.maximum(layer0, m0.astype(jnp.int32) * (j + 1))
                if j != i:
                    visible = (
                        (jnp.abs(px[j] - px[i]) <= hf)
                        & (jnp.abs(py[j] - py[i]) <= hf)
                    )
                    g1x = jnp.clip(gx[j] - ox, 0, fov - 1)
                    g1y = jnp.clip(gy[j] - oy, 0, fov - 1)
                    m1 = (f_r == g1x) & (f_c == g1y) & visible
                    layer1 = jnp.maximum(
                        layer1, m1.astype(jnp.int32) * (j + 1)
                    )
            # layer2: blocks at ABSOLUTE coords [0,fov) (reference quirk);
            # fov <= min(W, L): rows [0,fov) x cols [0,fov) of the block
            # board by static row concatenation
            rows_ = [block[r_ * L : r_ * L + fov, :] for r_ in range(fov)]
            layer2 = (jnp.concatenate(rows_, axis=0) > 0.5).astype(jnp.int32)
            # boundary bars overwrite
            abs_r = f_r + ox
            abs_c = f_c + oy
            bad = (abs_r < 0) | (abs_r > W - 1) | (abs_c < 0) | (abs_c > L - 1)
            layer2 = jnp.where(bad, 1, layer2)

            # direction vector with zoom (dmfb.py:441-453); jnp.round is
            # round-half-even, matching the reference's Python round()
            def zoom(d, extent):
                scale = (extent - hf) / (10 - hf)
                pos_z = jnp.round((d - hf) / scale).astype(jnp.int32) + hf
                neg_z = jnp.round((d + hf) / scale).astype(jnp.int32) - hf
                return jnp.where(jnp.abs(d) > hf,
                                 jnp.where(d > 0, pos_z, neg_z), d)

            drx = zoom(gx[i] - px[i], W)
            dry = zoom(gy[i] - py[i], L)
            agent_obs.append(jnp.concatenate(
                [layer0, layer1, layer2, drx, dry], axis=0,
            ).astype(jnp.int8))
        obs_o[:] = jnp.concatenate(agent_obs, axis=0)

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

    # batch-minor layouts (see module docstring)
    pos = state.pos.reshape(B, 2 * N).T
    goal = state.goal.reshape(B, 2 * N).T
    dist = state.dist.T
    health = state.health.reshape(B, WL).T
    usage = state.usage.reshape(B, WL).T
    block = state.block_mask.reshape(B, WL).astype(jnp.float32).T

    out_shapes = (
        jax.ShapeDtypeStruct((2 * N, B), jnp.int32),   # pos
        jax.ShapeDtypeStruct((N, B), jnp.int32),       # dist
        jax.ShapeDtypeStruct((WL, B), jnp.float32),    # usage
        jax.ShapeDtypeStruct((1, B), jnp.int32),       # step_count
        jax.ShapeDtypeStruct((1, B), jnp.int32),       # cum_constraints
        jax.ShapeDtypeStruct((N, B), jnp.float32),     # rewards
        jax.ShapeDtypeStruct((N * obs_dim, B), jnp.int8),  # obs
        jax.ShapeDtypeStruct((N, B), jnp.int8),        # dones
        jax.ShapeDtypeStruct((1, B), jnp.int8),        # terminated
        jax.ShapeDtypeStruct((1, B), jnp.int32),       # constraints
        jax.ShapeDtypeStruct((1, B), jnp.int32),       # success
        jax.ShapeDtypeStruct((1, B), jnp.float32),     # team reward
    )
    specs = lambda n: [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]
    (pos2, dist2, usage2, step2, cumc2, rew, obs_flat, dones, term, cons,
     succ, team) = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=specs(10),
        out_specs=tuple(specs(12)),
    )(pos, dist, goal, health, usage, block,
      actions.astype(jnp.int32).T, uniforms.T,
      state.step_count.reshape(B, 1).T, state.cum_constraints.reshape(B, 1).T)

    new_state = state._replace(
        pos=pos2.T.reshape(B, N, 2),
        dist=dist2.T,
        usage=usage2.T.reshape(B, W, L),
        step_count=step2[0],
        cum_constraints=cumc2[0],
    )
    out = StepOutput(
        obs=obs_flat.T.reshape(B, N, obs_dim),
        rewards=rew.T,
        team_reward=team[0],
        dones=dones.T.astype(bool),
        terminated=term[0].astype(bool),
        constraints=cons[0],
        success=succ[0],
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
