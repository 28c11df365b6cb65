"""End-to-end Trainer smokes: short training runs through the full driver
(rollout -> replay -> fused updates -> eval -> checkpoint) for VDN/QMIX on
DMFB and VDN on MEDA — the configurations the reference cannot run (QMIX,
MEDA training) must actually train here."""

import os

import numpy as np
import jax
import pytest

from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.trainer import Trainer


def run_short(tmp_path, name="dmfb", alg="vdn", **env_kw):
    args = Args(
        name=name, alg=alg, drop_num=2, fov=5,
        batch_size=8, buffer_size=32, n_parallel_envs=4,
        evaluate_task=4, evaluate_cycle=400, n_steps=700,
        anneal_steps=500, data_dir=str(tmp_path),
    )
    if name == "dmfb":
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    else:
        args.width, args.length, args.fov = 15, 30, 9
        env = make_env("meda", width=15, length=30, n_droplets=2, fov=9)
    trainer = Trainer(env, args)
    curves = trainer.run(online_evaluate=True)
    assert len(curves["success_rate"]) >= 2
    assert all(np.isfinite(v) for v in curves["rewards"])
    # checkpoints exist and reload
    trainer.load_model("final")
    return curves


class TestEndToEnd:
    def test_vdn_dmfb(self, tmp_path):
        run_short(tmp_path, "dmfb", "vdn")

    def test_qmix_dmfb(self, tmp_path):
        run_short(tmp_path, "dmfb", "qmix")

    def test_vdn_meda(self, tmp_path):
        run_short(tmp_path, "meda", "vdn")

    def test_qmix_meda(self, tmp_path):
        """QMIX x MEDA: the combination of the framework's two headline
        fixes over the reference (QMIX runnable at all,
        policy/qmix.py:88-90 dead state path; MEDA trainable at all,
        env/MEDA/meda.py:679 scalar obs_shape) — a 2*W*L-dim mixer state
        on the fine-grained array must train end-to-end."""
        run_short(tmp_path, "meda", "qmix")

    def test_vdn_dmfb_v01(self, tmp_path):
        """DMFB obs v0.1 (--version=0.1, reference dmfb.py:723-835): the
        4-layer float32 observation exercises the non-int8 replay dtype
        path end-to-end (envs/dmfb.py obs_dtype -> replay o_ext storage)."""
        args = Args(
            name="dmfb", alg="vdn", drop_num=2, fov=5, version="0.1",
            batch_size=8, buffer_size=32, n_parallel_envs=4,
            evaluate_task=4, evaluate_cycle=400, n_steps=700,
            anneal_steps=500, data_dir=str(tmp_path),
        )
        args.width = args.length = 5
        env = make_env("dmfb", version="0.1", width=5, length=5,
                       n_droplets=2, fov=5)
        trainer = Trainer(env, args)
        assert trainer.replay.data["o_ext"].dtype == np.float32
        curves = trainer.run(online_evaluate=True)
        assert len(curves["success_rate"]) >= 2
        assert all(np.isfinite(v) for v in curves["rewards"])
        trainer.load_model("final")


class TestResume:
    def test_training_resumes_from_checkpoint(self, tmp_path):
        """Save mid-training, reload into a fresh Trainer, and take more
        gradient steps — the optax state must restore structurally."""
        args = Args(
            name="dmfb", alg="vdn", drop_num=2, fov=5,
            batch_size=8, buffer_size=32, n_parallel_envs=4,
            evaluate_task=4, evaluate_cycle=300, n_steps=350,
            anneal_steps=500, data_dir=str(tmp_path),
        )
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        t1 = Trainer(env, args)
        t1.train_cycle()
        t1.save_model("mid")
        step_before = int(t1.learner_state.train_step)

        t2 = Trainer(env, args)
        t2.load_model("mid")
        assert int(t2.learner_state.train_step) == step_before
        t2.train_cycle()  # exercises the restored optimizer state
        assert int(t2.learner_state.train_step) > step_before

    def test_ckpt_replay_resume_is_bit_exact(self, tmp_path):
        """--ckpt_replay: a save/restore mid-training must produce EXACTLY
        the trajectory of an uninterrupted run — replay ring, training env
        states (incl. accumulated electrode wear under b_degrade), PRNG,
        epsilon all round-trip."""
        def mk(dd):
            args = Args(
                name="dmfb", alg="vdn", drop_num=2, fov=5,
                batch_size=8, buffer_size=32, n_parallel_envs=4,
                evaluate_task=4, evaluate_cycle=300, n_steps=350,
                anneal_steps=500, data_dir=str(dd), ckpt_replay=True,
                b_degrade=True, per_degrade=1.0,
            )
            args.width = args.length = 5
            env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5,
                           b_degrade=True, per_degrade=1.0)
            return Trainer(env, args)

        straight = mk(tmp_path / "a")
        for _ in range(4):
            straight.train_cycle()

        t1 = mk(tmp_path / "b")
        t1.train_cycle()
        t1.train_cycle()
        t1.save_model("mid")
        t2 = mk(tmp_path / "b")
        t2.load_model("mid")
        # the restored state IS the saved state
        np.testing.assert_array_equal(np.asarray(t2.key),
                                      np.asarray(t1.key))
        assert float(t2.epsilon) == float(t1.epsilon)
        np.testing.assert_array_equal(np.asarray(t2.replay.data["u"]),
                                      np.asarray(t1.replay.data["u"]))
        np.testing.assert_array_equal(np.asarray(t2.env_states.usage),
                                      np.asarray(t1.env_states.usage))
        t2.train_cycle()
        t2.train_cycle()
        # resumed trajectory == uninterrupted trajectory, bit-for-bit
        assert int(t2.learner_state.train_step) == int(
            straight.learner_state.train_step)
        np.testing.assert_array_equal(
            np.asarray(t2.replay.data["o_ext"]),
            np.asarray(straight.replay.data["o_ext"]))
        np.testing.assert_array_equal(np.asarray(t2.env_states.health),
                                      np.asarray(straight.env_states.health))
        for a, b in zip(jax.tree.leaves(t2.learner_state.params),
                        jax.tree.leaves(straight.learner_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # a mismatched replay capacity on resume must fail loudly BY PATH,
        # never silently truncate/pad the restored ring
        args3 = Args(
            name="dmfb", alg="vdn", drop_num=2, fov=5,
            batch_size=8, buffer_size=64, n_parallel_envs=4,
            evaluate_task=4, evaluate_cycle=300, n_steps=350,
            anneal_steps=500, data_dir=str(tmp_path / "b"), ckpt_replay=True,
            b_degrade=True, per_degrade=1.0,
        )
        args3.width = args3.length = 5
        env3 = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5,
                        b_degrade=True, per_degrade=1.0)
        t3 = Trainer(env3, args3)
        with pytest.raises(ValueError, match="shape mismatch"):
            t3.load_model("mid")


class TestCrossBoardQmixEval:
    def test_qmix_params_only_restore_on_bigger_board(self, tmp_path):
        """A QMIX checkpoint evaluates zero-shot on a DIFFERENT board size:
        the state-conditioned mixer's hypernet is tied to the training
        board's W*L, but greedy evaluation never calls the mixer, so
        ``load_model(params_only=True)`` keeps a fresh mixer when shapes
        mismatch instead of failing (reference evaluate.py generalization
        workload, evaluate.py:7-29)."""
        args = Args(
            name="dmfb", alg="qmix", drop_num=2, fov=5,
            batch_size=8, buffer_size=32, n_parallel_envs=4,
            evaluate_task=4, evaluate_cycle=400, n_steps=400,
            anneal_steps=500, data_dir=str(tmp_path),
        )
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        t1 = Trainer(env, args)
        t1.train_cycle()
        t1.save_model("final")
        agent_leaf = jax.tree.leaves(t1.learner_state.params["agent"])[0]

        big_args = Args(
            name="dmfb", alg="qmix", drop_num=2, fov=5,
            evaluate_task=4, data_dir=str(tmp_path),
        )
        big_args.width = big_args.length = 9
        big_env = make_env("dmfb", width=9, length=9, n_droplets=2, fov=5)
        t2 = Trainer(big_env, big_args, eval_only=True)
        t2.load_model("final", params_only=True)
        # agent params restored exactly; mixer fell back to fresh
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(t2.learner_state.params["agent"])[0]),
            np.asarray(agent_leaf),
        )
        m = t2.evaluate()
        assert np.isfinite(m["success_rate"])

    def test_qmix_full_restore_still_strict(self, tmp_path):
        """A FULL (training-resume) restore must still fail loudly on a
        board-size mismatch — leniency is params_only-specific."""
        args = Args(
            name="dmfb", alg="qmix", drop_num=2, fov=5,
            batch_size=8, buffer_size=32, n_parallel_envs=4,
            evaluate_task=4, evaluate_cycle=400, n_steps=400,
            anneal_steps=500, data_dir=str(tmp_path),
        )
        args.width = args.length = 5
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        t1 = Trainer(env, args)
        t1.train_cycle()
        t1.save_model("final")

        big_args = Args(
            name="dmfb", alg="qmix", drop_num=2, fov=5,
            batch_size=8, buffer_size=32, n_parallel_envs=4,
            evaluate_task=4, data_dir=str(tmp_path),
        )
        big_args.width = big_args.length = 9
        big_env = make_env("dmfb", width=9, length=9, n_droplets=2, fov=5)
        t2 = Trainer(big_env, big_args)
        with pytest.raises(ValueError):
            t2.load_model("final")
