"""PettingZoo-style interactive wrapper over the functional envs.

The reference environments implement the PettingZoo ``ParallelEnv`` dict API
(``env/DMFB/dmfb.py:474-640``, ``env/MEDA/meda.py:457-681``).  Internally
this framework is array-world (functional state + vmap); this thin shim
recreates the familiar single-environment, stateful, dict-keyed interface at
the edge for interactive use, notebooks and drop-in migration:

    env = ParallelEnvShim(make_env("dmfb", ...), seed=0)
    obs = env.reset()
    obs, rewards, dones, info = env.step({"player_0": 1, ...})

Agents are named ``player_{i}`` like the reference (dmfb.py:493).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from marl_dmfb_tpu.envs.registry import Env


class ParallelEnvShim:
    metadata = {"render.modes": ["human", "rgb_array"]}

    def __init__(self, env: Env, seed: int = 0, show: bool = False,
                 savemp4: Union[bool, str] = False):
        self.env = env
        self.agents = [f"player_{i}" for i in range(env.n_agents)]
        self.possible_agents = self.agents[:]
        self._state = env.init(jax.random.PRNGKey(seed))
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset, static_argnames=("new",))
        self._restart = jax.jit(env.restart)
        self.rewards = {a: 0.0 for a in self.agents}
        self.dones = {a: False for a in self.agents}
        self._renderer = None
        if show or savemp4:
            from marl_dmfb_tpu.render import Renderer

            self._renderer = Renderer(
                env, save_path=(savemp4 if isinstance(savemp4, str) else None)
            )

    # -- PettingZoo ParallelEnv surface ---------------------------------
    def reset(self, new: bool = False) -> List[np.ndarray]:
        self._state = self._reset(self._state, new=new)
        self.rewards = {a: 0.0 for a in self.agents}
        self.dones = {a: False for a in self.agents}
        obs = np.array(self.env.observe(self._state))
        self.render()
        return [obs[i] for i in range(len(self.agents))]

    def restart(self):
        self._state = self._restart(self._state)
        self.rewards = {a: 0.0 for a in self.agents}
        self.dones = {a: False for a in self.agents}
        obs = np.array(self.env.observe(self._state))
        return [obs[i] for i in range(len(self.agents))]

    def step(self, actions):
        if isinstance(actions, dict):
            acts = [actions[a] for a in self.agents]
        elif isinstance(actions, (list, tuple, np.ndarray)):
            acts = list(actions)
        else:
            raise TypeError("wrong actions")
        self._state, out = self._step(self._state, jnp.asarray(acts))
        obs = np.array(out.obs)
        for i, a in enumerate(self.agents):
            self.rewards[a] = float(out.rewards[i])
            self.dones[a] = bool(out.dones[i])
        info = {
            "constraints": int(out.constraints),
            "success": int(out.success),
        }
        self.render()
        return (
            [obs[i] for i in range(len(self.agents))],
            dict(self.rewards),
            dict(self.dones),
            info,
        )

    def get_env_info(self) -> dict:
        return self.env.env_info()

    def render(self, close: bool = False):
        if self._renderer is None:
            return
        if close:
            self._renderer.close()
            return
        self._renderer.draw(self._state)

    def seed(self, seed: Optional[int] = None):
        if seed is not None:
            self._state = self._state._replace(key=jax.random.PRNGKey(seed))

    def close(self):
        self.render(close=True)

    # -- extras ---------------------------------------------------------
    @property
    def state(self):
        """The underlying functional state PyTree."""
        return self._state

    def global_state(self) -> np.ndarray:
        return np.array(self.env.global_state(self._state))
