"""MEDA fine-grained array environment, TPU-native.

Pure-functional re-design of the reference MEDA simulator
(``env/MEDA/meda.py``).  Key semantic differences from DMFB preserved here:

* droplets are square bodies of radius ``r=2`` (5x5 microelectrode cells),
  moving 3 cells straight / 2 cells diagonal per step (meda.py:106-138);
* 9 actions: N,E,S,W,NE,SE,SW,NW,STALL (meda.py:23-32);
* no hard collision revert — instead a −0.6 proximity *punishment* per
  too-close pair per droplet (meda.py:321-330), accumulated into ``fails``;
* a droplet within ``goal_dist`` of its destination SNAPS onto it and its
  ``status`` flag latches (meda.py:272-277);
* move-success probability is the MEAN electrode health under the droplet's
  footprint (meda.py:302-309);
* the health/usage boards are indexed ``[y][x]`` with shape
  ``(width, length)`` — x is the column/length axis (meda.py:302-309).

All droplet-pair geometry uses squared integer center distances: every
reference comparison (snap, reward, punish, too-close) is a threshold on a
Euclidean distance of integer centers, so comparing squared ints is exact
(no float sqrt needed on the hot path).

The per-droplet sequential move order with interleaved RNG draws
(meda.py:241-259) is preserved via ``lax.fori_loop``; ``uniforms`` are an
explicit argument to ``step_core`` for draw-for-draw differential testing.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from marl_dmfb_tpu.envs.dmfb import StepOutput  # shared output structure

N_ACTIONS = 9
RADIUS = 2  # reference meda.py:150 (self.r = 2) -> 5x5-cell droplets

# Per-action (dx, dy): N,E,S,W step 3; diagonals step 2 (meda.py:106-130,
# where move() hardcodes r=3 and diagonals shift r-1).
_ACTION_DELTAS = np.array(  # np: import must not init the backend (multi-host)
    [
        [0, -3],   # N
        [3, 0],    # E
        [0, 3],    # S
        [-3, 0],   # W
        [2, -2],   # NE
        [2, 2],    # SE
        [-2, 2],   # SW
        [-2, -2],  # NW
        [0, 0],    # STALL
    ],
    dtype=jnp.int32,
)

# Squared-distance thresholds (see module docstring).
GOAL_DIST = 2 * RADIUS  # droplet.radius + dest.radius (meda.py:272)
SQ_GOAL = GOAL_DIST * GOAL_DIST            # snap when sq_dist < 16
SQ_PUNISH = int((1.5 * GOAL_DIST) ** 2)    # punish when sq_dist < 36
SQ_TOO_CLOSE = int((1.5 * (2 * RADIUS + 2)) ** 2)  # task-gen spacing: 81


@dataclasses.dataclass(frozen=True)
class MEDAParams:
    """Static environment configuration."""

    width: int = 30    # y extent (rows)
    length: int = 60   # x extent (cols)
    n_droplets: int = 4
    fov: int = 19
    stall: bool = True           # unused by MEDA dynamics (parity: ctor arg only)
    b_degrade: bool = False
    per_degrade: float = 0.1
    obs_version: str = "v0"      # "v0" | "v0.1" (4-layer f32) | "v0.2" (3-layer int8)

    def __post_init__(self):
        n_limit = int(self.width / 15) * int(self.length / 15)
        if self.n_droplets > n_limit:  # reference meda.py:151-154
            raise RuntimeError(
                "Too many droplets in the %dx%d MEDA array" % (self.width, self.length)
            )
        if self.fov % 2 != 1:
            raise ValueError("fov must be odd")

    @property
    def max_step(self) -> int:
        return self.width + self.length  # reference meda.py:492

    @property
    def episode_limit(self) -> int:
        return self.max_step

    @property
    def n_layers(self) -> int:
        return 3 if self.obs_version == "v0.2" else 4

    @property
    def obs_dim(self) -> int:
        return self.n_layers * self.fov * self.fov + 2

    @property
    def obs_shape(self) -> Tuple[int, ...]:
        # Normalized to the DMFB tuple layout (channels, fov, fov, vec, flat)
        # — the reference's MEDA get_env_info returns a bare scalar
        # (meda.py:679) which breaks its own training path; fixed here.
        return (self.n_layers, self.fov, self.fov, 2, self.obs_dim)

    @property
    def state_dim(self) -> int:
        return 2 * self.width * self.length

    @property
    def obs_dtype(self):
        import jax.numpy as _jnp

        return _jnp.int8 if self.obs_version == "v0.2" else _jnp.float32

    def env_info(self) -> dict:
        return {
            "n_actions": N_ACTIONS,
            "n_agents": self.n_droplets,
            "obs_shape": self.obs_shape,
            "state_shape": self.state_dim,
            "episode_limit": self.episode_limit,
        }


class MEDAState(NamedTuple):
    center: jax.Array   # (N, 2) int32 — droplet body center (x, y)
    start: jax.Array    # (N, 2) int32 — start centers
    dest: jax.Array     # (N, 2) int32 — destination centers
    sq_dist: jax.Array  # (N,) int32 — squared center distance to dest
    status: jax.Array   # (N,) bool — latched "snapped onto goal" flags
    health: jax.Array   # (W, L) f32, indexed [y][x]
    usage: jax.Array    # (W, L) f32
    degrade: jax.Array  # (W, L) f32
    step_count: jax.Array       # () int32
    fails_count: jax.Array  # () int32 — cumulative too-close incidences; the
                            # reference's float `fails` equals -0.6 * this
    key: jax.Array


# ---------------------------------------------------------------------------
# Task generation
# ---------------------------------------------------------------------------


def _rand_center(params: MEDAParams, key: jax.Array) -> jax.Array:
    """Random legal body center (reference getRandomYX, meda.py:224-227:
    y in [r, width-r-1], x in [r, length-r-1], both inclusive)."""
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (), RADIUS, params.length - RADIUS, dtype=jnp.int32)
    y = jax.random.randint(ky, (), RADIUS, params.width - RADIUS, dtype=jnp.int32)
    return jnp.stack([x, y])


def _sq(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a - b
    return jnp.sum(d * d, axis=-1)


_GEN_ROUNDS = 32


def _fallback_lattice(params: MEDAParams) -> jnp.ndarray:
    """Deterministic valid centers (spacing >= 9), used only in the
    astronomically unlikely event that all sampled rounds are invalid."""
    import numpy as np

    xs = np.arange(RADIUS, params.length - RADIUS, 9)
    ys = np.arange(RADIUS, params.width - RADIUS, 9)
    grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    assert grid.shape[0] >= params.n_droplets
    return jnp.asarray(grid[: params.n_droplets], jnp.int32)


def _rand_centers_batch(params: MEDAParams, key: jax.Array) -> jax.Array:
    """(R, 2) candidate centers (reference getRandomYX bounds,
    meda.py:224-227)."""
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (_GEN_ROUNDS,), RADIUS,
                           params.length - RADIUS, jnp.int32)
    y = jax.random.randint(ky, (_GEN_ROUNDS,), RADIUS,
                           params.width - RADIUS, jnp.int32)
    return jnp.stack([x, y], axis=-1)


def _first_valid(cand: jax.Array, valid: jax.Array, fallback: jax.Array):
    """First valid candidate — identical distribution to rejection
    sampling, branch-free (no while_loop)."""
    first = jnp.argmax(valid)
    return jnp.where(jnp.any(valid), cand[first], fallback)


def _gen_centers(params: MEDAParams, key: jax.Array) -> jax.Array:
    """Sequentially generate N centers, each rejected while too close
    (squared center distance < 81) to any earlier one
    (reference _genLegalDroplet/_isGoodDroplet, meda.py:213-233); each
    droplet's rejection is a vectorized first-valid pick."""
    n = params.n_droplets
    lattice = _fallback_lattice(params)
    centers = jnp.zeros((n, 2), dtype=jnp.int32)
    mask = jnp.zeros((n,), bool)  # which rows of `centers` are placed
    for i in range(n):  # static unroll, tiny
        key, sub = jax.random.split(key)
        cand = _rand_centers_batch(params, sub)                  # (R, 2)
        sq = jnp.sum(
            (cand[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )                                                        # (R, n)
        ok = jnp.all(~mask[None, :] | (sq >= SQ_TOO_CLOSE), axis=1)
        c = _first_valid(cand, ok, lattice[i])
        centers = centers.at[i].set(c)
        mask = mask.at[i].set(True)
    return centers


def _gen_dests(params: MEDAParams, key: jax.Array, droplets: jax.Array) -> jax.Array:
    """Destinations: too-close rejection vs earlier destinations PLUS
    body-overlap rejection vs the droplet's own start
    (reference addTask, meda.py:175-185: overlap iff |dx|<=2r and |dy|<=2r)."""
    n = params.n_droplets
    lattice = jnp.flip(_fallback_lattice(params), axis=0)
    dests = jnp.zeros((n, 2), dtype=jnp.int32)
    mask = jnp.zeros((n,), bool)
    for i in range(n):
        key, sub = jax.random.split(key)
        cand = _rand_centers_batch(params, sub)
        sq = jnp.sum((cand[:, None, :] - dests[None, :, :]) ** 2, axis=-1)
        no_close = jnp.all(~mask[None, :] | (sq >= SQ_TOO_CLOSE), axis=1)
        no_overlap = ~jnp.all(
            jnp.abs(cand - droplets[i][None, :]) <= 2 * RADIUS, axis=1
        )
        c = _first_valid(cand, no_close & no_overlap, lattice[i])
        dests = dests.at[i].set(c)
        mask = mask.at[i].set(True)
    return dests


def _new_task(params: MEDAParams, key: jax.Array):
    k1, k2 = jax.random.split(key)
    starts = _gen_centers(params, k1)
    dests = _gen_dests(params, k2, starts)
    sq_dist = _sq(starts, dests).astype(jnp.int32)
    return starts, dests, sq_dist


def random_degrade_map(params: MEDAParams, key: jax.Array) -> jax.Array:
    """Same recipe as DMFB (reference meda.py:497-504)."""
    if not params.b_degrade:
        return jnp.ones((params.width, params.length), dtype=jnp.float32)
    k1, k2 = jax.random.split(key)
    m = jax.random.uniform(k1, (params.width, params.length)) * 0.4 + 0.6
    sel = jax.random.uniform(k2, (params.width, params.length))
    return jnp.where(sel < 1.0 - params.per_degrade, 1.0, m).astype(jnp.float32)


def init(params: MEDAParams, key: jax.Array) -> MEDAState:
    key, k_task, k_deg = jax.random.split(key, 3)
    starts, dests, sq_dist = _new_task(params, k_task)
    w, l = params.width, params.length
    return MEDAState(
        center=starts,
        start=starts,
        dest=dests,
        sq_dist=sq_dist,
        status=jnp.zeros((params.n_droplets,), dtype=bool),
        health=jnp.ones((w, l), dtype=jnp.float32),
        usage=jnp.zeros((w, l), dtype=jnp.float32),
        degrade=random_degrade_map(params, k_deg),
        step_count=jnp.int32(0),
        fails_count=jnp.int32(0),
        key=key,
    )


def update_health(params: MEDAParams, state: MEDAState) -> MEDAState:
    """Reference meda.py:600-605 — a no-op unless b_degrade."""
    if not params.b_degrade:
        return state
    worn = state.usage > 50.0
    return state._replace(
        health=jnp.where(worn, state.health * state.degrade, state.health),
        usage=jnp.where(worn, 0.0, state.usage),
    )


def reset(params: MEDAParams, state: MEDAState, new: bool = False) -> MEDAState:
    """New task; wear persists and decays on reset (meda.py:541-550)."""
    key, k_task = jax.random.split(state.key)
    starts, dests, sq_dist = _new_task(params, k_task)
    state = state._replace(
        center=starts,
        start=starts,
        dest=dests,
        sq_dist=sq_dist,
        status=jnp.zeros((params.n_droplets,), dtype=bool),
        step_count=jnp.int32(0),
        fails_count=jnp.int32(0),
        key=key,
    )
    return update_health(params, state)


def restart(params: MEDAParams, state: MEDAState) -> MEDAState:
    """Same task from the start (meda.py:170-173, 552-561)."""
    return state._replace(
        center=state.start,
        sq_dist=_sq(state.start, state.dest).astype(jnp.int32),
        status=jnp.zeros((params.n_droplets,), dtype=bool),
        step_count=jnp.int32(0),
        fails_count=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def _footprint_mean_health(params: MEDAParams, health: jax.Array, c: jax.Array):
    """Mean health under the (2r+1)^2 footprint (meda.py:302-309);
    board indexed [y][x].  One-hot band contraction instead of a
    dynamic-slice gather (TPU: vmapped gathers are slow)."""
    k = 2 * RADIUS + 1
    ys = jnp.arange(params.width)
    xs = jnp.arange(params.length)
    band_y = (jnp.abs(ys - c[1]) <= RADIUS).astype(jnp.float32)
    band_x = (jnp.abs(xs - c[0]) <= RADIUS).astype(jnp.float32)
    return band_y @ health @ band_x / (k * k)


def _move_droplets(
    params: MEDAParams,
    center: jax.Array,
    sq_dist: jax.Array,
    dest: jax.Array,
    status: jax.Array,
    health: jax.Array,
    actions: jax.Array,
    uniforms: jax.Array,
):
    """Sequential per-droplet moves (meda.py:241-292).

    Statically unrolled over the tiny droplet count with one-hot
    select/masked-update over the droplet axis — no dynamic slices or
    scatters on the hot path (see dmfb._move_droplets)."""
    n = params.n_droplets
    lo = jnp.array([RADIUS, RADIUS], jnp.int32)
    hi = jnp.array([params.length - 1 - RADIUS, params.width - 1 - RADIUS], jnp.int32)
    deltas = (
        jax.nn.one_hot(actions, N_ACTIONS, dtype=jnp.float32)
        @ _ACTION_DELTAS.astype(jnp.float32)
    ).astype(jnp.int32)                       # (n, 2)
    rewards = jnp.zeros((n,), dtype=jnp.float32)

    for i in range(n):  # static unroll
        sel = jnp.arange(n) == i
        c_i = jnp.sum(jnp.where(sel[:, None], center, 0), axis=0)
        sq_i = jnp.sum(jnp.where(sel, sq_dist, 0))
        done = jnp.any(sel & status)
        snap = (~done) & (sq_i < SQ_GOAL)  # meda.py:272-277
        # Stochastic move only when neither done nor snapping.
        prob = _footprint_mean_health(params, health, c_i)
        moved = (~done) & (~snap) & (uniforms[i] <= prob)
        cand = jnp.clip(c_i + deltas[i], lo, hi)
        new_c = jnp.where(snap, dest[i], jnp.where(moved, cand, c_i))
        sq_new = _sq(new_c, dest[i])
        # Reward table (meda.py:283-291), on squared distances (exact).
        r = jnp.where(
            sq_new < SQ_GOAL,
            0.0,
            jnp.where(
                (sq_new == sq_i) & (actions[i] == 8),
                -0.2,
                jnp.where(sq_new < sq_i, -0.08, -0.4),
            ),
        )
        rewards = jnp.where(sel, jnp.where(done | snap, 0.0, r), rewards)
        sq_dist = jnp.where(sel, jnp.where(done, sq_i, jnp.where(snap, 0, sq_new)),
                            sq_dist)
        center = jnp.where(sel[:, None], jnp.where(done, c_i, new_c)[None, :],
                           center)
        status = jnp.where(sel, done | snap, status)
    return center, sq_dist, status, rewards


def _punish(center: jax.Array):
    """−0.6 per too-close unordered pair, per droplet (meda.py:321-330).
    Returns (per-droplet punish f32, total incidence count i32)."""
    n = center.shape[0]
    sq = jnp.sum(
        (center[:, None, :] - center[None, :, :]) ** 2, axis=-1
    )
    close = (sq < SQ_PUNISH) & ~jnp.eye(n, dtype=bool)
    per_droplet = jnp.sum(close, axis=1).astype(jnp.int32)
    return -0.6 * per_droplet.astype(jnp.float32), jnp.sum(per_droplet)


def step_core(
    params: MEDAParams,
    state: MEDAState,
    actions: jax.Array,
    uniforms: jax.Array,
) -> Tuple[MEDAState, StepOutput]:
    """One transition (reference MEDAEnv.step, meda.py:513-539)."""
    actions = actions.astype(jnp.int32)
    center, sq_dist, status, rewards = _move_droplets(
        params, state.center, state.sq_dist, state.dest, state.status,
        state.health, actions, uniforms,
    )
    punish, n_close = _punish(center)
    # reference 'fail' is the float punish sum (== -0.6 * n_close); tracked
    # here as an exact integer incidence count so `fails == 0` checks don't
    # depend on float accumulation.
    rewards = rewards + punish
    fails_count = state.fails_count + n_close
    all_done = jnp.all(status)
    bonus = jnp.where(all_done, jnp.where(fails_count == 0, 6.0, 3.0), 0.0)
    rewards = rewards + bonus

    step_count = state.step_count + 1
    within = step_count < params.max_step
    success = jnp.where(within & all_done & (fails_count == 0), 1, 0).astype(jnp.int32)
    dones = jnp.where(within, status, True)

    # addUsage only while within the step limit (meda.py:529-534,591-598):
    # each not-done droplet wears its whole footprint.  Band outer products
    # instead of scatters.
    ys = jnp.arange(params.width)
    xs = jnp.arange(params.length)
    band_y = (jnp.abs(ys[None, :] - center[:, 1, None]) <= RADIUS).astype(jnp.float32)
    band_x = (jnp.abs(xs[None, :] - center[:, 0, None]) <= RADIUS).astype(jnp.float32)
    wear = jnp.einsum("nw,nl,n->wl", band_y, band_x,
                      (~dones).astype(jnp.float32))
    usage = state.usage + wear * within.astype(jnp.float32)

    state = state._replace(
        center=center,
        sq_dist=sq_dist,
        status=status,
        usage=usage,
        step_count=step_count,
        fails_count=fails_count,
    )
    obs = observe(params, state)
    # The reference reports the (float, <=0) punish sum as info['constraints']
    # (meda.py:538); StepOutput.constraints is an int32 count across envs, so
    # report the number of too-close droplet incidences this step instead
    # (zero iff the reference value is zero).
    out = StepOutput(
        obs=obs,
        rewards=rewards.astype(jnp.float32),
        team_reward=jnp.mean(rewards).astype(jnp.float32),
        dones=dones,
        terminated=jnp.all(dones),
        constraints=n_close,
        success=success,
    )
    return state, out


def step(params: MEDAParams, state: MEDAState, actions: jax.Array):
    key, sub = jax.random.split(state.key)
    uniforms = jax.random.uniform(sub, (params.n_droplets,))
    state = state._replace(key=key)
    return step_core(params, state, actions, uniforms)


# ---------------------------------------------------------------------------
# Observation
# ---------------------------------------------------------------------------


def _footprint_masks(params, centers, ox, oy, clip_border):
    """(n, fov, fov) bool masks of the body footprints on the [row=y][col=x]
    canvas, vectorized over droplets.

    clip_border=False: only the in-FOV part is painted (meda.py:631-658).
    clip_border=True: footprint cells are np.clip-projected onto the border
    (meda.py:659-671) — the image of the rect is the rect of clipped corners.
    """
    fov = params.fov
    rows = jnp.arange(fov)
    row_lo = centers[:, 1] - RADIUS - oy
    row_hi = centers[:, 1] + RADIUS - oy
    col_lo = centers[:, 0] - RADIUS - ox
    col_hi = centers[:, 0] + RADIUS - ox
    if clip_border:
        row_lo = jnp.clip(row_lo, 0, fov - 1)
        row_hi = jnp.clip(row_hi, 0, fov - 1)
        col_lo = jnp.clip(col_lo, 0, fov - 1)
        col_hi = jnp.clip(col_hi, 0, fov - 1)
    rmask = (rows[None, :] >= row_lo[:, None]) & (rows[None, :] <= row_hi[:, None])
    cmask = (rows[None, :] >= col_lo[:, None]) & (rows[None, :] <= col_hi[:, None])
    return rmask[:, :, None] & cmask[:, None, :]


def _max_paint(masks, ids):
    """Ascending-id overwrite == per-cell max id (ids ascend with j):
    one reduce instead of an unrolled scatter loop."""
    vals = masks * ids[:, None, None].astype(jnp.int32)
    return jnp.max(vals, axis=0).astype(jnp.float32)


def _in_fov_all(centers, ox, oy, fov):
    """Which body rects intersect the FOV window — (n,) bool."""
    return (
        (centers[:, 0] + RADIUS >= ox) & (centers[:, 0] - RADIUS <= ox + fov - 1)
        & (centers[:, 1] + RADIUS >= oy) & (centers[:, 1] - RADIUS <= oy + fov - 1)
    )


def _boundary_layer(params: MEDAParams, cx, cy):
    """Boundary wall bars (meda.py:829-841): rows keyed by center_x vs
    *width*, cols by center_y vs *length* — the reference's literal formula,
    kept for parity."""
    fov, hf = params.fov, params.fov // 2
    rows = jnp.arange(fov)
    abs_r = cx - hf + rows
    abs_c = cy - hf + rows
    row_bad = (abs_r < 0) | (abs_r > params.width - 1)
    col_bad = (abs_c < 0) | (abs_c > params.length - 1)
    return (row_bad[:, None] | col_bad[None, :])


def _observe_one(params: MEDAParams, state: MEDAState, i):
    fov = params.fov
    n = params.n_droplets
    cx, cy = state.center[i, 0], state.center[i, 1]
    hf = fov // 2
    ox, oy = cx - hf, cy - hf
    f32 = jnp.float32
    js = jnp.arange(n)
    ids = (js + 1).astype(jnp.int32)
    own = (js == i).astype(jnp.int32)
    other = (js != i).astype(jnp.int32)

    drop_masks = _footprint_masks(params, state.center, ox, oy, False)
    dest_masks = _footprint_masks(params, state.dest, ox, oy, False)
    dest_clip_masks = _footprint_masks(params, state.dest, ox, oy, True)

    if params.obs_version == "v0":
        # meda.py:613-674: own droplet, own goal, others, others' goals(clip)
        l0 = _max_paint(drop_masks, ids * own)
        l1 = _max_paint(dest_masks, ids * own)
        l2 = _max_paint(drop_masks, ids * other)
        l3 = _max_paint(dest_clip_masks, ids * other)
        direction = jnp.stack(
            [state.dest[i, 0] - cx, state.dest[i, 1] - cy]
        ).astype(f32)
        pixel = jnp.stack([l0, l1, l2, l3])
        return jnp.concatenate([pixel.reshape(-1), direction])

    # v0.1 / v0.2 share the "observed" visibility rule (meda.py:800-808).
    observed = _in_fov_all(state.center, ox, oy, fov).astype(jnp.int32)
    l_drops = _max_paint(drop_masks, ids)  # all droplets incl. self
    l_goals = _max_paint(dest_clip_masks, ids * other * observed)
    l_bound = _boundary_layer(params, cx, cy).astype(f32)

    if params.obs_version == "v0.1":
        l_own_goal = _max_paint(dest_masks, ids * own)
        direction = jnp.stack(
            [
                (state.dest[i, 1] - cy) / params.width,
                (state.dest[i, 0] - cx) / params.length,
            ]
        ).astype(f32)
        pixel = jnp.stack([l_drops, l_own_goal, l_goals, l_bound])
        return jnp.concatenate([pixel.reshape(-1), direction])

    # v0.2 (meda.py:846-897): 3 int8 layers + int direction zoomed to 30x30.
    dy = jnp.round((state.dest[i, 1] - cy) / (params.width / 30.0)).astype(jnp.int8)
    dx = jnp.round((state.dest[i, 0] - cx) / (params.length / 30.0)).astype(jnp.int8)
    pixel = jnp.stack([l_drops, l_goals, l_bound]).astype(jnp.int8)
    return jnp.concatenate([pixel.reshape(-1), jnp.stack([dy, dx])])


def observe(params: MEDAParams, state: MEDAState) -> jax.Array:
    return jax.vmap(lambda i: _observe_one(params, state, i))(
        jnp.arange(params.n_droplets)
    )


def global_state(params: MEDAParams, state: MEDAState) -> jax.Array:
    """Global footprint boards (droplet ids, destination ids) flattened —
    the QMIX mixer state (new capability; the reference has none for MEDA)."""
    w, l = params.width, params.length
    rows = jnp.arange(w)
    cols = jnp.arange(l)
    ids = jnp.arange(1, params.n_droplets + 1, dtype=jnp.int32)

    def boards(centers):
        rmask = jnp.abs(rows[None, :] - centers[:, 1, None]) <= RADIUS
        cmask = jnp.abs(cols[None, :] - centers[:, 0, None]) <= RADIUS
        masks = rmask[:, :, None] & cmask[:, None, :]
        return jnp.max(masks * ids[:, None, None], axis=0).astype(jnp.float32)

    return jnp.stack([boards(state.center), boards(state.dest)]).reshape(-1)
