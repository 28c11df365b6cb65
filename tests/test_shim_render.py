"""Tests for the PettingZoo-style shim and the procedural renderer."""

import numpy as np
import pytest

from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.envs.pettingzoo_shim import ParallelEnvShim
from marl_dmfb_tpu.render import Renderer


class TestShim:
    def test_reference_like_api(self):
        env = make_env("dmfb", width=8, length=8, n_droplets=3, fov=5)
        shim = ParallelEnvShim(env, seed=0)
        assert shim.agents == ["player_0", "player_1", "player_2"]
        obs = shim.reset()
        assert len(obs) == 3 and obs[0].shape == (env.params.obs_dim,)
        obs, rew, dones, info = shim.step({a: 0 for a in shim.agents})
        assert set(rew) == set(shim.agents)
        assert isinstance(info["constraints"], int)
        # list actions accepted too (dmfb.py:563-568)
        obs, rew, dones, info = shim.step([1, 1, 1])
        with pytest.raises(TypeError):
            shim.step("nope")

    def test_episode_runs_to_done(self):
        env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
        shim = ParallelEnvShim(env, seed=1)
        shim.reset()
        for t in range(env.episode_limit):
            _, _, dones, _ = shim.step([0, 0])
            if all(dones.values()):
                break
        assert all(dones.values())

    def test_restart_replays_task(self):
        env = make_env("dmfb", width=8, length=8, n_droplets=2, fov=5)
        shim = ParallelEnvShim(env, seed=2)
        o1 = shim.reset()
        shim.step([1, 2])
        o2 = shim.restart()
        np.testing.assert_array_equal(np.stack(o1), np.stack(o2))


class TestRenderer:
    def test_dmfb_frame(self):
        env = make_env("dmfb", width=8, length=8, n_droplets=2, fov=5)
        shim = ParallelEnvShim(env, seed=0)
        shim.reset()
        r = Renderer(env, u_size=10)
        f = r.draw(shim.state)
        assert f.shape == (80, 80, 3) and f.dtype == np.uint8
        assert f.std() > 0  # not a blank frame
        r.close()

    def test_meda_frame_and_video(self, tmp_path):
        env = make_env("meda", width=15, length=30, n_droplets=2, fov=9)
        shim = ParallelEnvShim(env, seed=0)
        shim.reset()
        path = str(tmp_path / "v.mp4")
        r = Renderer(env, u_size=8, save_path=path)
        for _ in range(3):
            shim.step([0, 1])
            r.draw(shim.state)
        r.close()
        import os

        assert os.path.getsize(path) > 0
