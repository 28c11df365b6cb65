"""Device-resident episode replay buffer.

Re-design of the reference's host NumPy ring buffer
(``common/replay_buffer.py``): same episode-granularity semantics (dict of
``(size, T, N, .)`` arrays, int8 observations, ring overwrite, uniform
sampling) but as an immutable PyTree updated with XLA scatters — it lives in
HBM next to the learner, so storing a rollout and sampling a minibatch are
pure jitted ops with no host round-trip.

The reference's ``_get_storage_idx`` (replay_buffer.py:58-75) is equivalent
to modulo arithmetic on a running write cursor; we use that closed form.
Optionally stores the flattened global state per step (``s``/``s_next``) —
the reference wires QMIX but never collects a state (SURVEY §2.2); here it
is first-class so QMIX actually trains.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    data: dict            # str -> (size, T, ...) arrays
    cursor: jax.Array     # () int32 — next write slot
    size: jax.Array       # () int32 — number of valid episodes


def init_replay(
    capacity: int,
    episode_limit: int,
    n_agents: int,
    obs_dim: int,
    n_actions: int,
    obs_dtype=jnp.int8,
    state_dim: Optional[int] = None,
) -> ReplayState:
    S, T, N, A = capacity, episode_limit, n_agents, n_actions
    data = {
        "o": jnp.zeros((S, T, N, obs_dim), obs_dtype),
        "u": jnp.zeros((S, T, N, 1), jnp.int8),
        "r": jnp.zeros((S, T, 1), jnp.float32),
        "o_next": jnp.zeros((S, T, N, obs_dim), obs_dtype),
        "avail_u": jnp.zeros((S, T, N, A), jnp.int8),
        "avail_u_next": jnp.zeros((S, T, N, A), jnp.int8),
        "u_onehot": jnp.zeros((S, T, N, A), jnp.int8),
        "padded": jnp.zeros((S, T, 1), bool),
        "terminated": jnp.zeros((S, T, 1), bool),
    }
    if state_dim is not None:
        data["s"] = jnp.zeros((S, T, state_dim), jnp.float32)
        data["s_next"] = jnp.zeros((S, T, state_dim), jnp.float32)
    return ReplayState(data=data, cursor=jnp.int32(0), size=jnp.int32(0))


def store(replay: ReplayState, episodes: dict) -> ReplayState:
    """Ring-write a batch of B episodes (each array (B, T, ...))."""
    some = episodes["o"]
    B = some.shape[0]
    capacity = replay.data["o"].shape[0]
    idx = (replay.cursor + jnp.arange(B)) % capacity
    data = {
        k: v.at[idx].set(episodes[k].astype(v.dtype))
        for k, v in replay.data.items()
    }
    return ReplayState(
        data=data,
        cursor=(replay.cursor + B) % capacity,
        size=jnp.minimum(replay.size + B, capacity),
    )


def sample(replay: ReplayState, key: jax.Array, batch_size: int) -> dict:
    """Uniform minibatch of episodes (replay_buffer.py:51-56).  Like the
    reference (np.random.randint over current_size), sampling is with
    replacement.  batch_size is static; when fewer episodes are stored the
    sample repeats episodes (the reference instead shrinks the batch —
    min(current_size, batch_size), train.py:75-76 — which would retrigger
    XLA compilation per size; repetition keeps shapes static and is
    equivalent in expectation)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(replay.size, 1))
    return {k: v[idx] for k, v in replay.data.items()}
