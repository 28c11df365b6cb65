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
    init, learn, net, learn_many, _ = make_learner(args, env)
    return args, env, init, learn, net


class TestDistributed:
    def test_two_process_training_step(self, tmp_path):
        """2-process jax.distributed CPU job (the multi-host substitute,
        SURVEY §4:254-256): both processes must initialize via the
        env-var contract, form one global mesh, run the full sharded
        training step to the same finite loss, and save+restore a
        full-state Orbax checkpoint with BOTH processes participating
        (orbax multi-process save is collective; restore goes through the
        production restructure_by_path)."""
        import os
        import re
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "_distributed_worker.py")
        procs = []
        for pid in range(2):
            env = dict(
                os.environ,
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                JAX_PLATFORMS="cpu",
                MARL_DMFB_CKPT_DIR=str(tmp_path),
            )
            procs.append(subprocess.Popen(
                [sys.executable, worker], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
        losses = []
        for out in outs:
            m = re.search(r"DIST_OK process=\d loss=([\d.eE+-]+)", out)
            assert m, out[-2000:]
            losses.append(float(m.group(1)))
            # the checkpoint round-trip ran and verified on every process
            assert re.search(r"CKPT_OK process=\d", out), out[-2000:]
        assert losses[0] == pytest.approx(losses[1], abs=1e-6)
        assert np.isfinite(losses[0])
        assert os.path.isdir(tmp_path / "dist_state")


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

    def test_trainer_cli_mesh_end_to_end(self, tmp_path):
        """A user launches sharded training with one flag: train.py --mesh
        builds the mesh and Trainer shards envs/replay + replicates params.
        Full CLI path on the 8-virtual-device mesh."""
        import train as train_cli

        train_cli.main([
            "dmfb", "--drop_num=2", "--fov=5", "--width=5",
            "--exact_steps=600", "--n_parallel_envs=8", "--mesh=8",
            "--evaluate_task=8", "--evaluate_cycle=400",
            "--data_dir", str(tmp_path),
        ])
        # curves + checkpoints landed
        import os

        result_dir = os.path.join(str(tmp_path), "TrainResult", "vdn", "fov5")
        assert os.path.isdir(result_dir)
        model_dir = os.path.join(str(tmp_path), "model", "vdn", "fov5")
        assert any(d.endswith("final_state") for d in os.listdir(model_dir))

    def test_trainer_mesh_shards_and_replicates(self, tmp_path):
        """Trainer(env, args, mesh): env batch sharded over the mesh, params
        replicated, replay sharded on capacity; batch rounds up to tile the
        mesh."""
        from marl_dmfb_tpu.trainer import Trainer

        args = Args(name="dmfb", alg="vdn", drop_num=2, fov=5,
                    batch_size=8, buffer_size=32, n_parallel_envs=6,
                    evaluate_task=8, evaluate_cycle=400, n_steps=400,
                    anneal_steps=500, data_dir=str(tmp_path))
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        mesh = make_mesh()
        tr = Trainer(env, args, mesh=mesh)
        assert tr.B == 8  # 6 rounded up to tile 8 devices
        assert not jax.tree.leaves(tr.env_states)[0].sharding.is_fully_replicated
        assert jax.tree.leaves(tr.learner_state.params)[0].sharding.is_fully_replicated
        assert not tr.replay.data["u"].sharding.is_fully_replicated
        tr.train_cycle()
        m = tr.evaluate()
        assert 0.0 <= m["success_rate"] <= 1.0
        # params stay replicated after sharded updates
        assert jax.tree.leaves(tr.learner_state.params)[0].sharding.is_fully_replicated

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


class TestSustainedShardedTraining:
    def test_sharded_training_trajectory_matches_unsharded(self, tmp_path):
        """Compressed CI variant of the sharded-to-quality run (RESULTS.md
        "Scaling"): TWO Trainers with identical seeds/args — one unsharded,
        one on the 8-device mesh — run many full collect+learn cycles.
        Errors that ACCUMULATE under sharding (replay cursor drift, epsilon
        carry, EMA-under-replication, grad psum bias) would escape a
        single-step loss check but diverge this trajectory."""
        from marl_dmfb_tpu.trainer import Trainer

        def build(mesh):
            args = Args(name="dmfb", alg="vdn", drop_num=2, fov=5,
                        batch_size=16, buffer_size=64, n_parallel_envs=16,
                        evaluate_task=8, evaluate_cycle=400, n_steps=400,
                        anneal_steps=2000, lr_decay=True, param_ema=0.99,
                        data_dir=str(tmp_path))
            args.width = args.length = 5
            env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
            return Trainer(env, args, mesh=mesh)

        plain, sharded = build(None), build(make_mesh())
        losses_p, losses_s = [], []
        for _ in range(12):
            plain.train_cycle()
            sharded.train_cycle()
            losses_p.append(float(plain._last_loss))
            losses_s.append(float(sharded._last_loss))
        # same PRNG stream -> same episodes; psum'd grads must track the
        # unsharded update closely enough that 12 cycles don't diverge
        np.testing.assert_allclose(losses_p, losses_s, rtol=2e-2, atol=1e-3)
        # epsilon schedule carried identically across rollouts
        assert float(plain.epsilon) == pytest.approx(
            float(sharded.epsilon), abs=1e-6)
        # replay ring state advanced identically
        assert int(plain.replay.size) == int(sharded.replay.size)
        assert int(plain.replay.cursor) == int(sharded.replay.cursor)
        # final params (and the EMA used for eval/save) still match
        for a, b in zip(jax.tree.leaves(plain.learner_state.params),
                        jax.tree.leaves(sharded.learner_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)
        for a, b in zip(jax.tree.leaves(plain.ema_params),
                        jax.tree.leaves(sharded.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)


class TestLocalSampling:
    """--local_sampling: device-local ring writes + per-device minibatch
    sampling (replay.make_local_store / qlearn.learn_many shard_map path)
    — zero cross-device replay traffic per cycle."""

    def test_local_store_keeps_episodes_on_their_device(self):
        mesh = make_mesh()
        n = mesh.devices.size
        cap, B, T, N, obs = 32, 16, 4, 2, 6
        rb = shard_batch(mesh, replay_lib.init_replay(
            capacity=cap, episode_limit=T, n_agents=N, obs_dim=obs,
            n_actions=5,
        ))
        # distinctive per-episode actions: episode e has u == e everywhere
        eps = {
            "o_ext": jnp.ones((B, T + 1, N, obs), jnp.int8),
            "u": jnp.tile(jnp.arange(B, dtype=jnp.int8)[:, None, None, None],
                          (1, T, N, 1)),
            "r": jnp.zeros((B, T, 1), jnp.float32),
            "padded": jnp.zeros((B, T, 1), bool),
            "terminated": jnp.zeros((B, T, 1), bool),
        }
        eps = shard_batch(mesh, eps)
        store_local = replay_lib.make_local_store(mesh)
        rb = store_local(rb, eps)
        assert int(rb.size) == B and int(rb.cursor) == B
        # device d collected episodes [d*B/n, (d+1)*B/n); they must live in
        # device d's capacity shard (rows [d*cap/n, ...))
        u = np.asarray(rb.data["u"])  # (cap, T, N) merged layout
        cap_l, b_l = cap // n, B // n
        for d in range(n):
            got = sorted(set(u[d * cap_l:d * cap_l + b_l].flatten().tolist()))
            want = list(range(d * b_l, (d + 1) * b_l))
            assert got == want, (d, got, want)
            # the rest of the shard is still empty
            assert not u[d * cap_l + b_l:(d + 1) * cap_l].any()

    def test_local_store_ring_wraparound(self):
        """Per-shard rings must overwrite OLDEST-first independently on
        every device: after 3 stores into a capacity of 2 stores, each
        shard holds the two most recent batches at the right local rows
        (cursor wrapped once), and size saturates at capacity."""
        mesh = make_mesh()
        n = mesh.devices.size
        cap, B, T, N, obs = 32, 16, 4, 2, 6  # cap = 2 stores of B
        rb = shard_batch(mesh, replay_lib.init_replay(
            capacity=cap, episode_limit=T, n_agents=N, obs_dim=obs,
            n_actions=5,
        ))
        store_local = replay_lib.make_local_store(mesh)

        def batch(tag):
            return shard_batch(mesh, {
                "o_ext": jnp.ones((B, T + 1, N, obs), jnp.int8),
                "u": jnp.full((B, T, N, 1), tag, jnp.int8),
                "r": jnp.zeros((B, T, 1), jnp.float32),
                "padded": jnp.zeros((B, T, 1), bool),
                "terminated": jnp.zeros((B, T, 1), bool),
            })

        for tag in (1, 2, 3):
            rb = store_local(rb, batch(tag))
        assert int(rb.size) == cap
        assert int(rb.cursor) == B  # wrapped once: 3*16 % 32
        u = np.asarray(rb.data["u"])            # (cap, T, N)
        cap_l, b_l = cap // n, B // n
        for d in range(n):
            shard = u[d * cap_l:(d + 1) * cap_l]
            # local rows [0, b_l): overwritten by batch 3; rows [b_l, 2b_l):
            # still batch 2 — independent ring per shard
            assert (shard[:b_l] == 3).all(), (d, shard[:, 0, 0])
            assert (shard[b_l:2 * b_l] == 2).all(), (d, shard[:, 0, 0])

    def test_local_sampling_draws_only_valid_episodes(self):
        """After ONE store (buffer 1/2 full), every sampled episode must be
        one that was actually stored — the global-contiguous ring would
        leave most shards empty and local sampling would read zeros.

        Sentinel check (not just a finite loss, which all-zero rows would
        also produce): episodes are stored with a distinctive o_ext fill
        per episode id and the SAME ``make_local_sample`` the learn path
        uses must return only those sentinels, each from the sampling
        device's own shard."""
        mesh = make_mesh()
        n = mesh.devices.size
        cap, B, T, N, obs = 32, 16, 4, 2, 6
        batch_size = 16
        rb = shard_batch(mesh, replay_lib.init_replay(
            capacity=cap, episode_limit=T, n_agents=N, obs_dim=obs,
            n_actions=5,
        ))
        # sentinel: episode e has o_ext == e+1 everywhere (nonzero!), and
        # u == e so the episode id is readable from both tensors
        eps = {
            "o_ext": jnp.tile(
                (jnp.arange(B, dtype=jnp.int8) + 1)[:, None, None, None],
                (1, T + 1, N, obs)),
            "u": jnp.tile(jnp.arange(B, dtype=jnp.int8)[:, None, None, None],
                          (1, T, N, 1)),
            "r": jnp.zeros((B, T, 1), jnp.float32),
            "padded": jnp.zeros((B, T, 1), bool),
            "terminated": jnp.zeros((B, T, 1), bool),
        }
        eps = shard_batch(mesh, eps)
        rb = replay_lib.make_local_store(mesh)(rb, eps)

        batch = replay_lib.make_local_sample(mesh, batch_size)(
            rb.data, rb.size, jax.random.PRNGKey(3)
        )
        o = np.asarray(batch["o_ext"])      # (batch, T+1, N*obs) merged
        u = np.asarray(batch["u"])          # (batch, T, N)
        b_l, ep_l = batch_size // n, B // n
        for i in range(batch_size):
            d = i // b_l                    # device that sampled row i
            ep = int(u[i, 0, 0])
            # every sampled episode is a STORED one (sentinels, no zeros),
            # and it came from the sampling device's own shard
            assert d * ep_l <= ep < (d + 1) * ep_l, (i, d, ep)
            assert (o[i] == ep + 1).all(), (i, ep)
            assert (u[i] == ep).all(), (i, ep)

        # and the full learn path over the same buffer stays healthy
        args = Args(name="dmfb", drop_num=2, fov=5, width=5, length=5,
                    batch_size=16, buffer_size=32, n_parallel_envs=16,
                    local_sampling=True)
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        args.update_env_info(env.env_info())
        init, learn, net, learn_many, _ = make_learner(args, env, mesh=mesh)
        lstate = replicate(mesh, init(jax.random.PRNGKey(0)))
        rollout = make_rollout(env, net, args.rnn_hidden_dim)
        states = shard_batch(mesh, jax.vmap(env.init)(
            jax.random.split(jax.random.PRNGKey(1), 16)
        ))
        res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        rb2 = shard_batch(mesh, replay_lib.init_replay(
            capacity=args.buffer_size, episode_limit=args.episode_limit,
            n_agents=2, obs_dim=args.obs_shape[-1], n_actions=args.n_actions,
        ))
        rb2 = replay_lib.make_local_store(mesh)(rb2, res.episodes)
        lstate2, loss = learn_many(lstate, rb2.data, rb2.size,
                                   jax.random.PRNGKey(3), 3)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(lstate2.params):
            assert leaf.sharding.is_fully_replicated

    def test_trainer_local_sampling_end_to_end(self, tmp_path):
        from marl_dmfb_tpu.trainer import Trainer

        args = Args(name="dmfb", alg="vdn", drop_num=2, fov=5,
                    batch_size=16, buffer_size=64, n_parallel_envs=16,
                    evaluate_task=8, evaluate_cycle=400, n_steps=400,
                    anneal_steps=2000, local_sampling=True,
                    data_dir=str(tmp_path))
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        tr = Trainer(env, args, mesh=make_mesh())
        losses = []
        for _ in range(4):
            tr.train_cycle()
            losses.append(float(tr._last_loss))
        assert all(np.isfinite(l) for l in losses)
        assert int(tr.replay.size) == 64  # 4 x 16, ring full
        m = tr.evaluate()
        assert 0.0 <= m["success_rate"] <= 1.0

    def test_local_sampling_requires_tiling_batch(self):
        args = Args(name="dmfb", drop_num=2, fov=5, width=5, length=5,
                    batch_size=12, local_sampling=True)
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        args.update_env_info(env.env_info())
        with pytest.raises(ValueError, match="local_sampling"):
            make_learner(args, env, mesh=make_mesh())
