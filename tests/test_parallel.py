"""Mesh-sharding tests on the 8-virtual-device CPU mesh: the full training
step must compile and run with the env batch sharded and params replicated,
and produce results consistent with the unsharded path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.parallel.mesh import (
    BATCH_AXIS, make_mesh, replicate, shard_batch,
)
from marl_dmfb_tpu.rollout import make_rollout


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    args = Args(name="dmfb", drop_num=2, fov=5, width=5, length=5,
                batch_size=16, buffer_size=64, n_parallel_envs=16)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args.update_env_info(env.env_info())
    init, learn, net, learn_many = make_learner(args, env)
    return args, env, init, learn, net


class TestMeshSharding:
    def test_rollout_sharded_equals_unsharded(self, setup):
        args, env, init, learn, net = setup
        lstate = init(jax.random.PRNGKey(0))
        B = 16
        states = jax.vmap(env.init)(
            jax.random.split(jax.random.PRNGKey(1), B)
        )
        rollout = make_rollout(env, net, args.rnn_hidden_dim)
        run = lambda st: rollout(
            lstate.params["agent"], st, jax.random.PRNGKey(2),
            jnp.float32(0.3), jnp.float32(0.0), jnp.float32(0.05),
            greedy=False,
        )
        res_plain = run(states)

        mesh = make_mesh()
        states_sh = shard_batch(mesh, states)
        res_sh = run(states_sh)
        # identical results: sharding must not change semantics
        np.testing.assert_array_equal(
            np.array(res_plain.episodes["u"]), np.array(res_sh.episodes["u"])
        )
        np.testing.assert_allclose(
            np.array(res_plain.reward), np.array(res_sh.reward), atol=1e-5
        )
        # outputs stay sharded on the batch axis
        sh = res_sh.episodes["o_ext"].sharding
        assert BATCH_AXIS in str(sh.spec) or sh.is_fully_replicated is False

    def test_full_training_step_on_mesh(self, setup):
        args, env, init, learn, net = setup
        mesh = make_mesh()
        lstate = replicate(mesh, init(jax.random.PRNGKey(0)))
        B = 16
        states = shard_batch(mesh, jax.vmap(env.init)(
            jax.random.split(jax.random.PRNGKey(1), B)
        ))
        rollout = make_rollout(env, net, args.rnn_hidden_dim)
        res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        rb = replay_lib.init_replay(
            capacity=args.buffer_size, episode_limit=args.episode_limit,
            n_agents=2, obs_dim=args.obs_shape[-1], n_actions=args.n_actions,
        )
        rb = shard_batch(mesh, rb)
        rb = replay_lib.store(rb, res.episodes)
        batch = replay_lib.sample(rb, jax.random.PRNGKey(3), args.batch_size)
        batch = shard_batch(mesh, batch)
        lstate2, loss = learn(lstate, batch)
        assert np.isfinite(float(loss))
        # params remain replicated after the update (grad psum by XLA)
        leaf = jax.tree.leaves(lstate2.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_learn_matches_unsharded(self, setup):
        args, env, init, learn, net = setup
        lstate = init(jax.random.PRNGKey(0))
        B = 16
        states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
        rollout = make_rollout(env, net, args.rnn_hidden_dim)
        res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        batch = res.episodes
        _, loss_plain = learn(lstate, batch)

        mesh = make_mesh()
        lstate_r = replicate(mesh, lstate)
        batch_sh = shard_batch(mesh, batch)
        _, loss_sh = learn(lstate_r, batch_sh)
        np.testing.assert_allclose(float(loss_plain), float(loss_sh), rtol=1e-5)
