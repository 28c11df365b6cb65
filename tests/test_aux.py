"""Differential tests for auxiliary components: TD(lambda) returns and the
MEDA baseline router vs the reference implementations."""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.append("/root/reference")  # append: repo-root modules (evaluate.py) must win

from marl_dmfb_tpu.utils.returns import td_lambda_target
from tests.ref_loader import load_reference_meda

# Differential-vs-reference module: self-skips on CI, where neither the
# reference tree nor torch is available.
import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference simulator not mounted (/root/reference)",
)


class TestTDLambda:
    def test_matches_reference(self):
        torch = pytest.importorskip("torch")
        from common.utils import td_lambda_target as ref_td

        rs = np.random.RandomState(0)
        b, T, n = 3, 7, 2
        # realistic episode structure: terminated at step L, padded after
        padded = np.zeros((b, T, 1), np.float32)
        terminated = np.zeros((b, T, 1), np.float32)
        for e, L in enumerate([4, 7, 6]):
            terminated[e, L - 1 :, 0] = 1
            padded[e, L:, 0] = 1
        batch_t = {
            "o": torch.zeros((b, T, n, 3)),
            "r": torch.tensor(rs.randn(b, T, 1).astype(np.float32)),
            "padded": torch.tensor(padded),
            "terminated": torch.tensor(terminated),
        }
        q = rs.randn(b, T, n).astype(np.float32)
        args = argparse.Namespace(n_agents=n, gamma=0.99, td_lambda=0.8)
        ref = ref_td(batch_t, T, torch.tensor(q), args).numpy()

        batch_j = {
            "r": jnp.asarray(batch_t["r"].numpy()),
            "padded": jnp.asarray(padded),
            "terminated": jnp.asarray(terminated),
        }
        out = np.array(td_lambda_target(batch_j, jnp.asarray(q), 0.99, 0.8, n))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestBaselineRouter:
    def test_paths_match_reference(self):
        ref_mod = load_reference_meda()
        from marl_dmfb_tpu.envs import baseline_router as br
        from marl_dmfb_tpu.envs import meda as jmeda
        from tests.test_vs_reference import random_meda_task

        rng = np.random.RandomState(3)
        w, l, n = 30, 60, 4
        starts, dests = random_meda_task(rng, w, l, n)

        ref_router = ref_mod.BaseLineRouter(w, l)
        mk = lambda c: ref_mod.Droplet(c[0] - 2, c[0] + 2, c[1] - 2, c[1] + 2)
        road_map_ref = []
        ref_paths = [
            [int(a) for a in ref_router.addPath(road_map_ref, mk(s), mk(d))]
            for s, d in zip(starts, dests)
        ]

        road_map = []
        my_paths = [
            br.plan_path(road_map, tuple(s), tuple(d), w, l)
            for s, d in zip(starts, dests)
        ]
        assert my_paths == ref_paths

    def test_estimated_reward_runs(self):
        from marl_dmfb_tpu.envs import baseline_router as br
        from marl_dmfb_tpu.envs import meda as jmeda
        from tests.test_vs_reference import make_meda_state, random_meda_task

        rng = np.random.RandomState(5)
        params = jmeda.MEDAParams(width=30, length=60, n_droplets=3)
        starts, dests = random_meda_task(rng, 30, 60, 3)
        state = make_meda_state(params, starts, dests)
        r, steps = br.estimated_reward(params, state)
        assert np.isfinite(r) and steps >= 0
        health = rng.rand(30, 60) * 0.4 + 0.6
        r2, steps2 = br.estimated_reward(params, state, m_health=health)
        assert np.isfinite(r2) and steps2 >= steps
