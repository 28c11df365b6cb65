"""Tests for the reference-style Agents facade."""

import numpy as np
import jax
import pytest

from marl_dmfb_tpu.agent import Agents
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.envs.pettingzoo_shim import ParallelEnvShim


def test_reference_style_episode_loop():
    """The reference's interactive loop (rollout.py:19-39) works verbatim."""
    args = Args(name="dmfb", drop_num=2, fov=5, width=5, length=5)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args.update_env_info(env.env_info())
    shim = ParallelEnvShim(env, seed=0)
    agents = Agents(args)
    obs = shim.reset()
    agents.init_hidden(1)
    last_action = np.zeros((2, 5))
    episode = {"o": [], "u": [], "r": [], "o_next": [], "padded": [],
               "terminated": []}
    for step in range(env.episode_limit):
        actions = []
        for i in range(2):
            a = agents.choose_action(obs[i], last_action[i], i, [1] * 5, 0.3)
            actions.append(a)
            last_action[i] = np.eye(5)[a]
        new_obs, rewards, dones, info = shim.step(actions)
        episode["o"].append(np.stack(obs))
        episode["u"].append(np.array(actions)[:, None])
        episode["r"].append([np.mean(list(rewards.values()))])
        episode["o_next"].append(np.stack(new_obs))
        episode["padded"].append([0.0])
        episode["terminated"].append([float(all(dones.values()))])
        obs = new_obs
        if all(dones.values()):
            break
    batch = {k: np.asarray(v)[None] for k, v in episode.items()}
    loss = agents.train(batch, 0)
    assert np.isfinite(loss)


def test_bad_alg_raises():
    args = Args(name="dmfb", alg="coma", drop_num=2, fov=5, width=5, length=5)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args.update_env_info(env.env_info())
    with pytest.raises(Exception, match="No such algorithm"):
        Agents(args)
