"""Uniform functional API over the biochip environments.

``make_env`` returns an :class:`Env` — a bundle of pure, jit/vmap-friendly
functions closed over the static params.  This replaces the reference's
``common/config.py`` class lookup (+ its ``os.chdir`` side effect, which is
handled at the CLI layer instead).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

from marl_dmfb_tpu.envs import dmfb as _dmfb
from marl_dmfb_tpu.envs import meda as _meda


class Env(NamedTuple):
    """A functional environment: pure functions over a state PyTree.

    All callables are single-instance; batch by ``jax.vmap`` over the state
    (and actions/uniforms), shard the batch axis over a mesh for scale-out.
    """

    name: str
    params: Any
    init: Callable          # (key) -> state
    reset: Callable         # (state, new=False) -> state
    restart: Callable       # (state) -> state
    step: Callable          # (state, actions) -> (state, StepOutput)
    step_core: Callable     # (state, actions, uniforms) -> (state, StepOutput)
    observe: Callable       # (state) -> (N, obs_dim)
    global_state: Callable  # (state) -> (state_dim,)

    @property
    def n_agents(self) -> int:
        return self.params.n_droplets

    @property
    def n_actions(self) -> int:
        return _dmfb.N_ACTIONS if self.name == "dmfb" else _meda.N_ACTIONS

    @property
    def episode_limit(self) -> int:
        return self.params.episode_limit

    def env_info(self) -> dict:
        return self.params.env_info()


def _bind(mod, params) -> dict:
    return dict(
        init=functools.partial(mod.init, params),
        reset=functools.partial(mod.reset, params),
        restart=functools.partial(mod.restart, params),
        step=functools.partial(mod.step, params),
        step_core=functools.partial(mod.step_core, params),
        observe=functools.partial(mod.observe, params),
        global_state=functools.partial(mod.global_state, params),
    )


def make_env(name: str = "dmfb", version: str | None = None, **kwargs) -> Env:
    """Build an environment bundle.

    ``version`` follows the reference CLI flags (``common/config.py``): for
    dmfb, ``'0.1'`` selects the 4-layer observation variant; for meda
    ``'0.1'``/``'0.2'`` select those observation encodings.

    DELIBERATE DEVIATION from the reference's mapping: the reference CLI
    maps its meda default ``'0.2'`` to the BASE v0 encoding because
    ``MEDAEnv_v0_2`` is unreachable from ``config()``
    (common/config.py:14-18) — and reference MEDA *training* crashes either
    way (scalar obs_shape, SURVEY §2.2).  Here ``'0.2'`` means the actual
    v0.2 encoding, making it the trainable default; pass
    ``obs_version='v0'`` to reproduce the reference's literal mapping.
    """
    obs_version = kwargs.pop("obs_version", None)
    if obs_version is None:
        obs_version = {"0.1": "v0.1", "0.2": "v0.2"}.get(version or "", "v0")
    if name == "dmfb":
        if obs_version == "v0.2":
            raise ValueError("dmfb has no v0.2 observation")
        params = _dmfb.DMFBParams(obs_version=obs_version, **kwargs)
        return Env(name="dmfb", params=params, **_bind(_dmfb, params))
    elif name == "meda":
        params = _meda.MEDAParams(obs_version=obs_version, **kwargs)
        return Env(name="meda", params=params, **_bind(_meda, params))
    raise ValueError(f"unknown env name: {name!r}")


def get_env_info(env: Env) -> dict:
    return env.env_info()
