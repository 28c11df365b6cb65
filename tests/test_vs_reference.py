"""Lockstep differential tests: the TPU env must reproduce the reference
simulator transition-for-transition under a shared injected task and a
shared move-success draw stream.

Protocol (per SURVEY §7 "hard parts"): the reference draws one uniform per
*moving* droplet, sequentially (dmfb.py:325-359).  We monkeypatch
``random.random`` with a logged stream, replay the reference's gating logic
to assign each logged draw to its droplet, and feed the same values into
``step_core``'s explicit ``uniforms`` argument.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marl_dmfb_tpu.envs import dmfb as jdmfb
from marl_dmfb_tpu.envs import meda as jmeda
from tests.ref_loader import load_reference_dmfb, load_reference_meda, DrawStream
from tests.test_dmfb_core import make_state

# The reference tree is mounted only on the build machine; CI runs without
# it, so these differential tests self-skip there (the rest of the pyramid
# still pins our own behavior).
import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference simulator not mounted (/root/reference)",
)


# ---------------------------------------------------------------------------
# DMFB
# ---------------------------------------------------------------------------


def inject_dmfb_task(ref_env, ref_mod, starts, ends, blocks):
    mgr = ref_env.routing_manager
    mgr.starts = np.asarray(starts)
    mgr.ends = np.asarray(ends)
    mgr.droplets = [
        ref_mod.Droplet(s[0], s[1], e[0], e[1]) for s, e in zip(starts, ends)
    ]
    mgr.distances = np.sum(np.abs(mgr.starts - mgr.ends), axis=1)
    mgr.blocks = [ref_mod.Block(x0, x1, y0, y1) for (x0, x1, y0, y1) in blocks]
    ref_env.step_count = 0
    ref_env.constraints = 0
    mgr.step_count = 0


def random_task(rng, w, l, n):
    """Random task honoring the >2 squared-distance spacing invariant."""
    while True:
        pts = np.stack(
            [rng.randint(0, w, size=2 * n), rng.randint(0, l, size=2 * n)], axis=1
        )
        d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d[np.arange(2 * n), np.arange(2 * n)] = 10 ** 9
        if d.min() > 2:
            return pts[:n], pts[n:]


def run_lockstep_dmfb(
    monkeypatch, w=10, l=10, n=4, fov=9, blocks=(), health=None, n_steps=40,
    seed=0, obs_exact=True, version="v0",
):
    ref_mod = load_reference_dmfb()
    ref_cls = ref_mod.DMFBenv_v0_1 if version == "v0.1" else ref_mod.DMFBenv
    ref_env = ref_cls(w, l, n, n_blocks=0, fov=fov)
    rng = np.random.RandomState(seed)
    starts, ends = random_task(rng, w, l, n)
    # keep injected blocks away from tasks to satisfy generation invariants
    inject_dmfb_task(ref_env, ref_mod, starts, ends, blocks)
    if health is not None:
        ref_env.routing_manager.m_health = np.asarray(health).copy()

    params = jdmfb.DMFBParams(width=w, length=l, n_droplets=n, fov=fov,
                              n_blocks=len(blocks), obs_version=version)
    state = make_state(params, starts, ends, blocks=list(blocks), health=health)

    stream = DrawStream(seed + 1000)
    monkeypatch.setattr(ref_mod.random, "random", stream)

    step_fn = jax.jit(
        lambda s, a, u: jdmfb.step_core(params, s, a, u)
    )

    # initial observation parity
    ref_obs0 = np.stack(ref_env.getObs()).astype(np.float64)
    my_obs0 = np.array(jdmfb.observe(params, state)).astype(np.float64)
    np.testing.assert_allclose(my_obs0, ref_obs0, atol=1e-6)

    for t in range(n_steps):
        dist_before = np.asarray(ref_env.routing_manager.distances).copy()
        acts = rng.randint(0, 5, size=n)
        n0 = len(stream.log)
        obs_r, rew_r, dones_r, info_r = ref_env.step(list(int(a) for a in acts))
        draws = stream.log[n0:]
        uniforms = np.full(n, 0.5)
        di = 0
        for i in range(n):
            if not (dist_before[i] == 0):  # stall=True gating (dmfb.py:331)
                uniforms[i] = draws[di]
                di += 1
        assert di == len(draws), "draw accounting mismatch"

        state, out = step_fn(state, jnp.asarray(acts), jnp.asarray(uniforms))

        ref_pos = np.array([[d.x, d.y] for d in ref_env.routing_manager.droplets])
        np.testing.assert_array_equal(np.array(state.pos), ref_pos, err_msg=f"step {t}")
        np.testing.assert_array_equal(
            np.array(state.dist), np.asarray(ref_env.routing_manager.distances)
        )
        ref_rewards = np.array([rew_r[a] for a in ref_env.agents])
        np.testing.assert_allclose(
            np.array(out.rewards), ref_rewards, atol=1e-5, err_msg=f"step {t}"
        )
        assert int(out.constraints) == int(info_r["constraints"])
        assert int(out.success) == int(info_r["success"])
        ref_dones = np.array([dones_r[a] for a in ref_env.agents])
        np.testing.assert_array_equal(np.array(out.dones), ref_dones)
        if obs_exact:
            np.testing.assert_allclose(
                np.array(out.obs).astype(np.float64),
                np.stack(obs_r).astype(np.float64),
                atol=1e-6, err_msg=f"step {t}",
            )
        np.testing.assert_allclose(
            np.array(state.usage), ref_env.routing_manager.m_usage, atol=1e-6
        )
    return state, ref_env


class TestDMFBLockstep:
    def test_basic_4_droplets(self, monkeypatch):
        run_lockstep_dmfb(monkeypatch, n=4, seed=0)

    def test_2_droplets_long(self, monkeypatch):
        run_lockstep_dmfb(monkeypatch, n=2, seed=1, n_steps=40)

    def test_with_blocks(self, monkeypatch):
        # blocks placed away from the injected task cells
        run_lockstep_dmfb(
            monkeypatch, n=2, seed=7, blocks=[(2, 3, 2, 3), (6, 7, 6, 7)],
            n_steps=40,
        )

    def test_degraded_health(self, monkeypatch):
        rng = np.random.RandomState(42)
        health = (rng.rand(10, 10) * 0.4 + 0.6).astype(np.float64)
        run_lockstep_dmfb(monkeypatch, n=4, seed=3, health=health, n_steps=40)

    def test_larger_board_10_droplets(self, monkeypatch):
        run_lockstep_dmfb(monkeypatch, w=20, l=20, n=10, seed=5, n_steps=30)

    def test_v01_obs(self, monkeypatch):
        run_lockstep_dmfb(monkeypatch, n=4, seed=11, version="v0.1")

    def test_v01_obs_crowded(self, monkeypatch):
        # small board forces the occupancy-fallback path in layer 2
        run_lockstep_dmfb(monkeypatch, w=7, l=7, n=4, fov=7, seed=13,
                          n_steps=28, version="v0.1")

    def test_v01_obs_10_droplets(self, monkeypatch):
        # n >= 10 switches the own-goal layer to the no-projection branch
        run_lockstep_dmfb(monkeypatch, w=20, l=20, n=10, seed=17, n_steps=25,
                          version="v0.1")

    def test_update_health_matches(self, monkeypatch):
        ref_mod = load_reference_dmfb()
        ref_env = ref_mod.DMFBenv(10, 10, 2, fov=9, b_degrade=True, per_degrade=1.0)
        mgr = ref_env.routing_manager
        rng = np.random.RandomState(0)
        mgr.m_usage = rng.rand(10, 10) * 100
        usage0 = mgr.m_usage.copy()
        params = jdmfb.DMFBParams(width=10, length=10, n_droplets=2, fov=9,
                                  b_degrade=True, per_degrade=1.0)
        starts, ends = random_task(rng, 10, 10, 2)
        state = make_state(params, starts, ends)
        state = state._replace(
            usage=jnp.asarray(usage0, jnp.float32),
            degrade=jnp.asarray(mgr.m_degrade, jnp.float32),
            health=jnp.asarray(mgr.m_health, jnp.float32),
        )
        mgr.updateHealth()
        state = jdmfb.update_health(state)
        np.testing.assert_allclose(np.array(state.health), mgr.m_health, atol=1e-6)
        np.testing.assert_allclose(np.array(state.usage), mgr.m_usage, atol=1e-6)


# ---------------------------------------------------------------------------
# MEDA
# ---------------------------------------------------------------------------


def random_meda_task(rng, w, l, n, r=2):
    sq_too_close = int((1.5 * (2 * r + 2)) ** 2)

    def gen(existing, extra_reject=None):
        while True:
            x = rng.randint(r, l - r)
            y = rng.randint(r, w - r)
            c = np.array([x, y])
            ok = all(((c - e) ** 2).sum() >= sq_too_close for e in existing)
            if ok and (extra_reject is None or not extra_reject(c)):
                return c

    starts, dests = [], []
    for i in range(n):
        s = gen(starts)
        starts.append(s)
        d = gen(dests, extra_reject=lambda c: (np.abs(c - s) <= 2 * r).all())
        dests.append(d)
    return np.stack(starts), np.stack(dests)


def inject_meda_task(ref_env, ref_mod, starts, dests, r=2):
    mgr = ref_env.routing_manager
    mk = lambda c: ref_mod.Droplet(c[0] - r, c[0] + r, c[1] - r, c[1] + r)
    mgr.droplets = [mk(c) for c in starts]
    mgr.destinations = [mk(c) for c in dests]
    import copy

    mgr.starts = [copy.deepcopy(d) for d in mgr.droplets]
    mgr._updateDistances()
    mgr.status = [False] * len(starts)
    ref_env.step_count = 0
    ref_env.fails = 0


def make_meda_state(params, starts, dests, health=None):
    w, l = params.width, params.length
    starts = jnp.asarray(starts, jnp.int32)
    dests = jnp.asarray(dests, jnp.int32)
    h = jnp.ones((w, l), jnp.float32) if health is None else jnp.asarray(
        health, jnp.float32
    )
    return jmeda.MEDAState(
        center=starts,
        start=starts,
        dest=dests,
        sq_dist=jnp.sum((starts - dests) ** 2, axis=1).astype(jnp.int32),
        status=jnp.zeros((params.n_droplets,), bool),
        health=h,
        usage=jnp.zeros((w, l), jnp.float32),
        degrade=jnp.ones((w, l), jnp.float32),
        step_count=jnp.int32(0),
        fails_count=jnp.int32(0),
        key=jax.random.PRNGKey(0),
    )


def run_lockstep_meda(
    monkeypatch, w=30, l=60, n=4, fov=19, version="v0", health=None,
    n_steps=40, seed=0,
):
    ref_mod = load_reference_meda()
    cls = {
        "v0": ref_mod.MEDAEnv,
        "v0.1": ref_mod.MEDAEnv_v0_1,
        "v0.2": ref_mod.MEDAEnv_v0_2,
    }[version]
    ref_env = cls(w, l, n, fov=fov)
    rng = np.random.RandomState(seed)
    starts, dests = random_meda_task(rng, w, l, n)
    inject_meda_task(ref_env, ref_mod, starts, dests)
    if health is not None:
        ref_env.m_health = np.asarray(health).copy()

    params = jmeda.MEDAParams(width=w, length=l, n_droplets=n, fov=fov,
                              obs_version=version)
    state = make_meda_state(params, starts, dests, health=health)

    stream = DrawStream(seed + 2000)
    monkeypatch.setattr(ref_mod.random, "random", stream)

    step_fn = jax.jit(lambda s, a, u: jmeda.step_core(params, s, a, u))

    ref_obs0 = np.stack([np.asarray(o, np.float64) for o in ref_env.getObs()])
    my_obs0 = np.array(jmeda.observe(params, state))
    np.testing.assert_allclose(my_obs0.astype(np.float64), ref_obs0, atol=1e-6)

    sq_goal = jmeda.SQ_GOAL
    for t in range(n_steps):
        mgr = ref_env.routing_manager
        dist_before = np.asarray(mgr.distances).copy()
        status_before = list(mgr.status)
        acts = rng.randint(0, 9, size=n)
        n0 = len(stream.log)
        obs_r, rew_r, dones_r, info_r = ref_env.step([int(a) for a in acts])
        draws = stream.log[n0:]
        uniforms = np.full(n, 0.5)
        di = 0
        for i in range(n):
            # draws only when not yet latched AND not snapping (meda.py:247-281:
            # snap when distances[i] < goal_dist == 4)
            if not status_before[i] and dist_before[i] >= jmeda.GOAL_DIST:
                uniforms[i] = draws[di]
                di += 1
        assert di == len(draws), f"draw accounting mismatch at step {t}"

        state, out = step_fn(state, jnp.asarray(acts), jnp.asarray(uniforms))

        ref_pos = np.array([[d.x_center, d.y_center] for d in mgr.droplets])
        np.testing.assert_array_equal(np.array(state.center), ref_pos,
                                      err_msg=f"step {t}")
        np.testing.assert_array_equal(
            np.array(state.status), np.asarray(mgr.status)
        )
        ref_rewards = np.array([rew_r[a] for a in ref_env.agents])
        np.testing.assert_allclose(np.array(out.rewards), ref_rewards,
                                   atol=1e-5, err_msg=f"step {t}")
        assert abs(-0.6 * float(state.fails_count) - float(ref_env.fails)) < 1e-4
        assert int(out.success) == int(info_r["success"])
        ref_dones = np.array([dones_r[a] for a in ref_env.agents])
        np.testing.assert_array_equal(np.array(out.dones), ref_dones)
        ref_obs = np.stack([np.asarray(o, np.float64) for o in obs_r])
        np.testing.assert_allclose(
            np.array(out.obs).astype(np.float64), ref_obs, atol=1e-6,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(np.array(state.usage), ref_env.m_usage,
                                   atol=1e-6)
    return state, ref_env


class TestMEDALockstep:
    def test_base_v0(self, monkeypatch):
        run_lockstep_meda(monkeypatch, seed=0)

    def test_v0_full_episode(self, monkeypatch):
        run_lockstep_meda(monkeypatch, seed=2, n_steps=90)

    def test_v01(self, monkeypatch):
        run_lockstep_meda(monkeypatch, version="v0.1", seed=1)

    def test_v02(self, monkeypatch):
        run_lockstep_meda(monkeypatch, version="v0.2", seed=3)

    def test_degraded_health(self, monkeypatch):
        rng = np.random.RandomState(9)
        health = rng.rand(30, 60) * 0.4 + 0.6
        run_lockstep_meda(monkeypatch, health=health, seed=4)

    def test_10_droplets_80x80(self, monkeypatch):
        run_lockstep_meda(monkeypatch, w=80, l=80, n=10, seed=6, n_steps=30)
