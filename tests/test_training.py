"""Tests for the replay buffer, on-device rollout, and TD learner."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.rollout import make_rollout, summarize_eval


def small_args(alg="vdn", **kw):
    a = Args(name="dmfb", alg=alg, drop_num=2, fov=5, width=5, length=5,
             batch_size=8, buffer_size=32, n_parallel_envs=4, **kw)
    return a


def small_env(args):
    env = make_env("dmfb", width=args.width, length=args.length,
                   n_droplets=args.drop_num, fov=args.fov)
    args.update_env_info(env.env_info())
    return env


class TestReplay:
    def _mk(self, capacity=5, T=3, N=2, D=4, A=5):
        return replay_lib.init_replay(capacity, T, N, D, A)

    def _episodes(self, B, T=3, N=2, D=4, A=5, fill=1):
        return {
            "o_ext": jnp.full((B, T + 1, N, D), fill, jnp.int8),
            "u": jnp.zeros((B, T, N, 1), jnp.int8),
            "r": jnp.full((B, T, 1), float(fill)),
            "padded": jnp.zeros((B, T, 1), bool),
            "terminated": jnp.zeros((B, T, 1), bool),
        }

    def test_ring_semantics(self):
        rb = self._mk(capacity=5)
        rb = replay_lib.store(rb, self._episodes(3, fill=1))
        assert int(rb.size) == 3 and int(rb.cursor) == 3
        rb = replay_lib.store(rb, self._episodes(3, fill=2))
        # wraps: slots 3,4 then 0
        assert int(rb.size) == 5 and int(rb.cursor) == 1
        o = np.array(rb.data["r"][:, 0])  # merged physical layout (S, T)
        np.testing.assert_allclose(o, [2, 1, 1, 2, 2])

    def test_sample_shapes(self):
        rb = self._mk()
        rb = replay_lib.store(rb, self._episodes(2))
        batch = replay_lib.sample(rb, jax.random.PRNGKey(0), 4)
        assert batch["o_ext"].shape == (4, 4, 2, 4)
        assert np.array(batch["r"]).min() == 1.0  # only stored episodes


class TestRollout:
    def setup_method(self):
        self.args = small_args()
        self.env = small_env(self.args)

    def _rollout(self, greedy=False, seed=0):
        from marl_dmfb_tpu.algos.qlearn import make_learner as ml

        init, learn, net, _, _ = ml(self.args, self.env)
        lstate = init(jax.random.PRNGKey(seed))
        B = self.args.rollout_batch
        states = jax.vmap(self.env.init)(
            jax.random.split(jax.random.PRNGKey(seed + 1), B)
        )
        rollout = make_rollout(self.env, net, self.args.rnn_hidden_dim)
        res = rollout(
            lstate.params["agent"], states, jax.random.PRNGKey(seed + 2),
            jnp.float32(0.5), jnp.float32(0.001), jnp.float32(0.05),
            greedy=greedy,
        )
        return res

    def test_episode_tensor_layout(self):
        res = self._rollout()
        T = self.env.episode_limit
        B = self.args.rollout_batch
        ep = res.episodes
        assert ep["o_ext"].shape == (B, T + 1, 2, self.env.params.obs_dim)
        assert ep["o_ext"].dtype == jnp.int8
        padded = np.array(ep["padded"])[:, :, 0]
        o_ext = np.array(ep["o_ext"], np.int32)
        # after termination: padded=1, terminated=1, obs zeroed past the
        # terminal observation
        term = np.array(ep["terminated"])[:, :, 0]
        for b in range(B):
            idx = np.where(term[b])[0]
            assert len(idx) > 0
            t_end = idx[0]
            assert not padded[b, t_end]  # the final real step is not padded
            if t_end + 1 < T:
                assert padded[b, t_end + 1 :].all()
                assert term[b, t_end + 1 :].all()
                # o_ext[t_end+1] is the terminal obs; beyond that, zeros
                assert (o_ext[b, t_end + 2 :] == 0).all()
                assert (o_ext[b, t_end + 1] != 0).any()

    def test_epsilon_annealing_and_metrics(self):
        res = self._rollout()
        T = self.env.episode_limit
        # epsilon decremented per EXECUTED env step (averaged over the
        # batch): terminated episodes stop consuming schedule, matching the
        # reference's per-step anneal (rollout.py:113-115,126-127).
        padded = np.array(res.episodes["padded"])[:, :, 0]
        executed = (~padded).sum() / padded.shape[0]
        assert float(res.epsilon) == pytest.approx(
            max(0.05, 0.5 - 0.001 * executed), abs=1e-5
        )
        # failed episodes count episode_limit steps
        steps = np.array(res.steps)
        succ = np.array(res.success)
        assert ((steps == T) | (succ == 1)).all()

    def test_greedy_deterministic_actions(self):
        r1 = self._rollout(greedy=True, seed=5)
        r2 = self._rollout(greedy=True, seed=5)
        np.testing.assert_array_equal(np.array(r1.episodes["u"]),
                                      np.array(r2.episodes["u"]))


class TestLearner:
    def _setup(self, alg="vdn"):
        args = small_args(alg=alg)
        env = small_env(args)
        init, learn, net, learn_many, _ = make_learner(args, env)
        lstate = init(jax.random.PRNGKey(0))
        B = args.rollout_batch
        states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
        rollout = make_rollout(env, net, args.rnn_hidden_dim,
                               with_state=(alg == "qmix"))
        res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        return args, env, init, learn, lstate, res

    def test_vdn_loss_decreases_on_fixed_batch(self):
        args, env, init, learn, lstate, res = self._setup("vdn")
        batch = {k: v for k, v in res.episodes.items()}
        losses = []
        for _ in range(30):
            lstate, loss = learn(lstate, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]

    def test_qmix_loss_decreases_on_fixed_batch(self):
        args, env, init, learn, lstate, res = self._setup("qmix")
        batch = {k: v for k, v in res.episodes.items()}
        assert "s_ext" in batch
        assert batch["s_ext"].shape[-1] == args.state_shape
        losses = []
        for _ in range(30):
            lstate, loss = learn(lstate, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]

    def test_scan_unroll_is_loss_identical(self):
        # unroll>1 only changes how XLA lays out the BPTT loop, never the math
        args, env, init, learn, lstate, res = self._setup("vdn")
        batch = res.episodes
        _, loss1 = learn(lstate, batch)
        args_u = dataclasses.replace(args, scan_unroll=4)
        init_u, learn_u, _, _, _ = make_learner(args_u, env)
        _, loss4 = learn_u(lstate, batch)
        np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-6)

    def test_scan_unroll_auto_selection(self, monkeypatch):
        # 0 (default) = full unroll for short horizons, rolled for long —
        # on TPU only (XLA:CPU compiles unrolled SPMD bodies for >1h);
        # an explicit value is used as-is on any backend
        import jax

        from marl_dmfb_tpu.algos import qlearn
        from marl_dmfb_tpu.algos.qlearn import _scan_unroll

        class A:
            scan_unroll = 0
            episode_limit = 40

        assert jax.default_backend() == "cpu"
        assert _scan_unroll(A) == 1  # auto never unrolls on CPU
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert _scan_unroll(A) == 40
        A.episode_limit = 64
        assert _scan_unroll(A) == 64
        A.episode_limit = 80
        assert _scan_unroll(A) == 1
        A.scan_unroll = 8
        assert _scan_unroll(A) == 8
        monkeypatch.undo()
        assert _scan_unroll(A) == 8  # explicit value respected on CPU too

    def test_target_sync_cadence(self):
        args, env, init, learn, lstate, res = self._setup("vdn")
        args.target_update_cycle = 3
        init, learn, net, learn_many, _ = make_learner(args, env)
        lstate = init(jax.random.PRNGKey(0))
        batch = res.episodes

        def flat(p):
            return np.concatenate([np.ravel(x) for x in jax.tree.leaves(p)])

        t0 = flat(lstate.target_params)
        for i in range(1, 4):
            lstate, _ = learn(lstate, batch)
            t = flat(lstate.target_params)
            if i < 3:
                np.testing.assert_array_equal(t, t0)  # unchanged until cycle
            else:
                assert not np.array_equal(t, t0)  # synced at step 3
                np.testing.assert_array_equal(t, flat(lstate.params))


class TestLearnMany:
    def test_fused_updates_advance_state(self):
        args = small_args()
        env = small_env(args)
        init, learn, net, learn_many, _ = make_learner(args, env)
        lstate = init(jax.random.PRNGKey(0))
        B = args.rollout_batch
        states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
        rollout = make_rollout(env, net, args.rnn_hidden_dim)
        res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        rb = replay_lib.init_replay(
            capacity=args.buffer_size, episode_limit=args.episode_limit,
            n_agents=args.n_agents, obs_dim=args.obs_shape[-1],
            n_actions=args.n_actions)
        rb = replay_lib.store(rb, res.episodes)
        l0 = jax.tree.leaves(lstate.params)[0].copy()
        lstate2, loss = learn_many(lstate, rb.data, rb.size,
                                   jax.random.PRNGKey(3), 5)
        assert int(lstate2.train_step) == 5
        assert np.isfinite(float(loss))
        assert not np.array_equal(np.array(l0),
                                  np.array(jax.tree.leaves(lstate2.params)[0]))
