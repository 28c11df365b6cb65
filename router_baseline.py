"""Success-rate benchmark of the MEDA staircase baseline router.

The reference ships ``BaseLineRouter`` (env/MEDA/meda.py:348-454) as its
non-RL comparison baseline but never calls it anywhere, and its reward
estimator crashes as written (np.average over a ragged tuple) — so the
comparison it was built for was never run.  This script runs it: plan
staircase paths for the same random-task protocol the RL evaluation uses
(tasks drawn by the functional MEDA env's ``init``), and score them with
the RL success criterion — every droplet reaches its goal (goal-snap
radius) within the episode limit.

Usage:
    python router_baseline.py [n_tasks] [drop_num]

Prints one JSON line.  Runs host-side (NumPy planner + CPU task draws).
"""

import json
import sys

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import numpy as np

from marl_dmfb_tpu.envs import baseline_router as br
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.envs import meda as jmeda


def route_task(starts, dests, width, length, limit):
    """Plan all droplets, then check the RL success criterion."""
    road_map: list = []
    paths = [
        br.plan_path(road_map, tuple(s), tuple(d), width, length)
        for s, d in zip(starts, dests)
    ]
    sq = lambda a, b: (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    longest = 0
    for path, s, d in zip(paths, starts, dests):
        cur = tuple(s)
        steps = None
        for t, act in enumerate(path):
            if sq(cur, d) < jmeda.SQ_GOAL:  # goal snap (meda.py:272-277)
                steps = t
                break
            cur = br._move_center(cur, act, width, length)
        if steps is None:
            if sq(cur, d) >= jmeda.SQ_GOAL:
                return False, limit  # path discarded/short -> never arrives
            steps = len(path)
        longest = max(longest, steps)
    return longest <= limit, min(longest, limit)


def main(n_tasks=100, drop_num=4):
    jax.config.update("jax_platforms", "cpu")
    env = make_env("meda", width=30, length=60, n_droplets=drop_num)
    limit = env.params.episode_limit
    keys = jax.random.split(jax.random.PRNGKey(0), n_tasks)
    states = jax.vmap(env.init)(keys)
    starts = np.asarray(states.start)
    dests = np.asarray(states.dest)

    succ, steps = [], []
    for i in range(n_tasks):
        ok, n_steps = route_task(starts[i], dests[i], 30, 60, limit)
        succ.append(ok)
        # failed episodes count the full limit (common/rollout.py:60-61)
        steps.append(limit if not ok else n_steps)
    print(json.dumps({
        "metric": f"meda_router_success_{drop_num}d",
        "value": float(np.mean(succ)),
        "unit": f"success rate over {n_tasks} tasks "
                f"(avg steps {float(np.mean(steps)):.1f}, limit {limit})",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
