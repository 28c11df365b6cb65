"""DMFB v0.1 observation variant (reference ``DMFBenv_v0_1.getOneObs``,
env/DMFB/dmfb.py:723-835): a 4-layer float FOV observation that adds the
agent's own goal layer and projects other *visible* droplets' goals toward
the FOV border along the droplet->goal direction, with an occupancy-fallback
scatter processed in ascending order of the droplets' remaining distance.

The projection's ``math.ceil(dx / dy * boundy)`` etc. are evaluated here in
exact integer arithmetic (``ceil(a/b) == -((-a)//b)``), which matches the
reference's float64 evaluation for all board-scale magnitudes.

The sequential, order-dependent fallback scatter runs under a
``lax.fori_loop`` over the (sorted) droplets — N is tiny.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ceil_div(a, b):
    return -((-a) // b)


def _floor_div(a, b):
    return a // b


def observe_one_v01(params, state, i):
    fov, hf = params.fov, params.fov // 2
    n = params.n_droplets
    f32 = jnp.float32
    cx, cy = state.pos[i, 0], state.pos[i, 1]
    ox, oy = cx - hf, cy - hf
    js = jnp.arange(n)

    relx = state.pos[:, 0] - ox
    rely = state.pos[:, 1] - oy

    # Layer 0 — droplet ids (incl. self) in the FOV (dmfb.py:743-751),
    # comparison-built (no board scatter / crop gather; see dmfb.py notes).
    rows0 = jnp.arange(fov)
    cell0 = (rows0[None, :, None] == relx[:, None, None]) & (
        rows0[None, None, :] == rely[:, None, None]
    )
    layer0 = jnp.max(
        cell0 * jnp.arange(1, n + 1)[:, None, None], axis=0
    ).astype(f32)
    seeing = (js != i) & (relx >= 0) & (relx < fov) & (rely >= 0) & (rely < fov)

    # Layer 1 — own goal (dmfb.py:753-764): projected (clipped) into the FOV
    # for < 10 agents, else only drawn when actually inside the FOV.
    rows = jnp.arange(fov)
    gx_rel = state.goal[i, 0] - ox
    gy_rel = state.goal[i, 1] - oy
    if n < 10:
        g1x = jnp.clip(gx_rel, 0, fov - 1)
        g1y = jnp.clip(gy_rel, 0, fov - 1)
        own_vis = jnp.bool_(True)
    else:
        g1x, g1y = gx_rel, gy_rel
        own_vis = (gx_rel >= 0) & (gx_rel < fov) & (gy_rel >= 0) & (gy_rel < fov)
    cell1 = (rows[:, None] == g1x) & (rows[None, :] == g1y) & own_vis
    layer1 = cell1.astype(f32) * (i + 1)

    # Layer 2 — visible others' goals, projected toward the FOV border with
    # occupancy fallback, in ascending order of remaining Manhattan distance
    # (stable; ties keep ascending idx) (dmfb.py:766-809).
    dist = jnp.sum(jnp.abs(state.pos - state.goal), axis=1)
    BIG = jnp.int32(1 << 20)
    order_key = jnp.where(seeing, dist * n + js, BIG)
    order = jnp.argsort(order_key)  # unique keys -> deterministic order

    dxs = state.goal[:, 0] - state.pos[:, 0]
    dys = state.goal[:, 1] - state.pos[:, 1]

    def body(k, canvas):
        j = order[k]
        valid = order_key[j] < BIG
        x, y = relx[j], rely[j]
        dx, dy = dxs[j], dys[j]
        boundx = jnp.where(dx >= 0, fov - 1 - x, -x)
        boundy = jnp.where(dy >= 0, fov - 1 - y, -y)
        exact = (jnp.abs(dx) <= jnp.abs(boundx)) & (jnp.abs(dy) <= jnp.abs(boundy))
        # guard divisors for the unused branches
        safe_dy = jnp.where(dy == 0, 1, dy)
        safe_dx = jnp.where(dx == 0, 1, dx)
        cdx_f = jnp.where(
            dx >= 0,
            jnp.minimum(boundx, _ceil_div(dx * boundy, safe_dy)),
            jnp.maximum(boundx, _floor_div(dx * boundy, safe_dy)),
        )
        cdy_f = jnp.where(
            dy >= 0,
            jnp.minimum(boundy, _ceil_div(dy * boundx, safe_dx)),
            jnp.maximum(boundy, _floor_div(dy * boundx, safe_dx)),
        )
        # reference branch chain: exact -> dx==0 -> dy==0 -> formula
        cdx = jnp.where(exact, dx,
              jnp.where(dx == 0, 0,
              jnp.where(dy == 0, boundx, cdx_f)))
        cdy = jnp.where(exact, dy,
              jnp.where(dx == 0, boundy,
              jnp.where(dy == 0, 0, cdy_f)))
        ti, tj = x + cdx, y + cdy

        def at(a, b):
            # safe canvas read (indices clipped; validity handled by flags)
            return canvas[jnp.clip(a, 0, fov - 1), jnp.clip(b, 0, fov - 1)]

        free0 = at(ti, tj) == 0
        samecell = (ti == x) & (tj == y)
        ok1 = (ti + 1 < fov) & (at(ti + 1, tj) == 0)
        ok2 = (ti - 1 >= 0) & (at(ti - 1, tj) == 0)
        ok3 = (tj + 1 < fov) & (at(ti, tj + 1) == 0)
        ok4 = (tj - 1 >= 0) & (at(ti, tj - 1) == 0)

        # first-free fallback in the reference's order (dmfb.py:793-809)
        si = jnp.where(free0, ti,
             jnp.where(ok1, ti + 1,
             jnp.where(ok2, ti - 1,
             jnp.where(ok3, ti, jnp.where(ok4, ti, ti)))))
        sj = jnp.where(free0, tj,
             jnp.where(ok1, tj,
             jnp.where(ok2, tj,
             jnp.where(ok3, tj + 1, jnp.where(ok4, tj - 1, tj)))))
        any_slot = free0 | ((~samecell) & (ok1 | ok2 | ok3 | ok4))
        write = valid & any_slot
        si = jnp.clip(si, 0, fov - 1)
        sj = jnp.clip(sj, 0, fov - 1)
        newval = jnp.where(write, (j + 1).astype(f32), canvas[si, sj])
        return canvas.at[si, sj].set(newval)

    layer2 = lax.fori_loop(0, n, body, jnp.zeros((fov, fov), f32))

    # Layer 3 — blocks at ABSOLUTE coords (same reference quirk as the base
    # obs, dmfb.py:813-818) + boundary bars (dmfb.py:819-831).
    from marl_dmfb_tpu.envs.dmfb import _boundary_overlay

    layer3 = state.block_mask[:fov, :fov].astype(f32)
    layer3 = _boundary_overlay(params, layer3, cx, cy)

    # Direction vector — note the v0.1 ordering: y-component first, divided
    # by length; x-component second, divided by width (dmfb.py:833).
    direction = jnp.stack(
        [
            (state.goal[i, 1] - cy) / params.length,
            (state.goal[i, 0] - cx) / params.width,
        ]
    ).astype(f32)
    pixel = jnp.stack([layer0, layer1, layer2, layer3])
    return jnp.concatenate([pixel.reshape(-1), direction])
