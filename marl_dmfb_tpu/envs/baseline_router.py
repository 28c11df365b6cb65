"""Deterministic staircase baseline router for MEDA (host-side).

Functional equivalent of the reference's ``BaseLineRouter``
(env/MEDA/meda.py:348-454): a non-RL comparison baseline that plans
x-then-y staircase paths per droplet, avoiding spatio-temporal collisions
with earlier droplets' paths, then estimates the achieved reward — exactly
(healthy chip) or in expectation under a degraded health map.

This is an offline analysis tool, not a training hot path, so it runs in
plain NumPy on the host; the reward simulation reuses the functional MEDA
env with injected all-success move draws.

Reference quirks kept for parity:
* when no collision-free insertion of the x-moves into the y-moves exists,
  the fallback path is effectively DISCARDED (meda.py:423-428 assigns to a
  dead variable), leaving an empty action list for that droplet;
* path padding uses Action N (meda.py:363-367).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from marl_dmfb_tpu.envs import meda as jmeda

N_ACT = jmeda.N_ACTIONS
E, W, S, N_ = 1, 3, 2, 0
R = jmeda.RADIUS


def _move_center(c, action, width, length):
    d = np.array(jmeda._ACTION_DELTAS)[action]
    x = int(np.clip(c[0] + d[0], R, length - 1 - R))
    y = int(np.clip(c[1] + d[1], R, width - 1 - R))
    return (x, y)


def _footprint(c):
    return {(y, x)
            for y in range(c[1] - R, c[1] + R + 1)
            for x in range(c[0] - R, c[0] + R + 1)}


def _check_valid_move(next_c, prev_c, road_map, next_v):
    """Scan the newly covered cells against earlier paths' time stamps
    (reference checkValidMove/getScanArea, meda.py:438-454)."""
    scan = _footprint(next_c) - _footprint(prev_c)
    for r_map in road_map:
        for (y, x) in scan:
            v = r_map[y][x]
            if next_v - 1 <= v <= next_v + 1:
                return False
    return True


def _mark(road_map_entry, c, value):
    for (y, x) in _footprint(c):
        road_map_entry[y][x] = value


def plan_path(road_map, start, dest, width, length) -> List[int]:
    """Staircase path for one droplet avoiding earlier paths
    (reference addPath, meda.py:396-436)."""
    delta_x = dest[0] - start[0]
    delta_y = dest[1] - start[1]
    x_moves = [E] * int(delta_x / 3) if delta_x > 0 else [W] * int(abs(delta_x) / 3)
    y_moves = [S] * int(delta_y / 3) if delta_y > 0 else [N_] * int(abs(delta_y) / 3)
    actions: List[int] = []
    for i in range(len(x_moves)):
        path = x_moves[:i] + y_moves + x_moves[i:]
        valid = True
        cur = start
        for j, act in enumerate(path):
            nxt = _move_center(cur, act, width, length)
            if _check_valid_move(nxt, cur, road_map, j + 1):
                cur = nxt
            else:
                valid = False
                break
        if valid:
            actions = path
            break
    # (reference fallback is dead code — empty path remains; meda.py:423-428)
    this_map = np.full((width, length), -1, dtype=np.int64)
    cur = start
    for step, act in enumerate(actions):
        _mark(this_map, cur, step)
        cur = _move_center(cur, act, width, length)
    _mark(this_map, cur, len(actions))
    road_map.append(this_map)
    return actions


def estimated_reward(
    params: jmeda.MEDAParams,
    state: jmeda.MEDAState,
    m_health: Optional[np.ndarray] = None,
) -> Tuple[float, float]:
    """Plan all paths and estimate total reward (reference
    getEstimatedReward, meda.py:353-389).

    Returns (sum of per-step mean rewards, max_steps) on a healthy chip, or
    (expected discounted reward, expected max steps) under ``m_health``.
    """
    width, length = params.width, params.length
    starts = np.asarray(state.start)
    dests = np.asarray(state.dest)
    n = params.n_droplets

    road_map: list = []
    trajectories = [
        plan_path(road_map, tuple(starts[i]), tuple(dests[i]), width, length)
        for i in range(n)
    ]
    max_step = max((len(t) for t in trajectories), default=0)
    for t in trajectories:
        t += [N_] * (max_step - len(t))

    # Simulate manager-level moves (reference calls moveDroplets directly
    # with all-ones health, meda.py:371-372 — no env-step bonuses/usage;
    # NB the reference then does np.average over the WHOLE (rewards, fail,
    # status) tuple, which raises on ragged input — i.e. the function is
    # unrunnable as shipped.  We implement the evident intent: the mean of
    # the per-droplet rewards).
    centers = [tuple(starts[i]) for i in range(n)]
    status = [False] * n
    sq = lambda a, b: (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    rewards = []
    steps = np.zeros(n)
    for t in range(max_step):
        if m_health is not None:
            probs = np.array([
                np.mean(np.asarray(m_health)[
                    c[1] - R : c[1] + R + 1, c[0] - R : c[0] + R + 1
                ]) for c in centers
            ])
        step_r = np.zeros(n)
        for i in range(n):
            if status[i]:
                continue
            d = tuple(dests[i])
            sq_old = sq(centers[i], d)
            if sq_old < jmeda.SQ_GOAL:
                centers[i] = d
                status[i] = True
                continue
            centers[i] = _move_center(centers[i], trajectories[i][t],
                                      width, length)
            sq_new = sq(centers[i], d)
            if sq_new < jmeda.SQ_GOAL:
                step_r[i] = 0.0
            elif sq_new == sq_old and trajectories[i][t] == 8:
                step_r[i] = -0.2
            elif sq_new < sq_old:
                step_r[i] = -0.08
            else:
                step_r[i] = -0.4
        # punish (meda.py:321-330)
        for i in range(n - 1):
            for j in range(i + 1, n):
                if sq(centers[i], centers[j]) < jmeda.SQ_PUNISH:
                    step_r[i] -= 0.6
                    step_r[j] -= 0.6
        np_r = float(np.mean(step_r))
        if m_health is None:
            rewards.append(np_r)
        else:
            fail = 1.0 - probs
            disc = np_r * probs - 0.9 * fail * probs - 1.8 * fail * fail * probs
            rewards.append(float(np.nanmean(disc)))
            steps = steps + 1.0 / probs
    if m_health is None:
        return sum(rewards), max_step
    return sum(rewards), float(steps.max()) if n else 0.0
