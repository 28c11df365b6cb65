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

PHYSICAL LAYOUT (TPU HBM padding): arrays are stored with the small
trailing dims merged — ``o_ext`` as ``(S, T+1, N*obs_dim)``, ``u`` as
``(S, T, N)``, scalars as ``(S, T)``.  TPU tiles the last two dims to
(sublane, lane) multiples, so a ``(.., N=10, 1085)`` int8 layout pads the
agent dim 10->32 (1.7x HBM blowup — a 5.2GB MEDA buffer OOMed the chip at
8.9GB physical).  ``sample``/``logical_views`` reshape back to the
``(b, T, N, .)`` views the learner consumes (reshapes are free — same
linear order)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    data: dict            # str -> (size, T, ...) arrays, merged layout
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
    """Episode storage schema.

    Memory-deduplicated vs the reference's layout (replay_buffer.py:17-26):
    ``o``/``o_next`` overlap by one step (o_next[t] == o[t+1] while live),
    so ONE ``o_ext`` array of length T+1 stores both views —
    ``o = o_ext[:, :T]``, ``o_next = o_ext[:, 1:]`` — halving the dominant
    buffer (a 10k-episode MEDA buffer would not fit HBM otherwise).
    Likewise ``avail`` stores the single availability mask the reference
    duplicates into avail_u/avail_u_next, and the QMIX global state is
    ``s_ext`` (T+1, int8 — the state layers are small integer ids).
    The learner's masked loss is IDENTICAL: derived views only differ at
    padded timesteps, which are masked out (and the eval-stream input at
    the first padded step actually matches the reference's o_next[t-1]
    exactly, vdn.py:139-148).
    """
    S, T, N = capacity, episode_limit, n_agents
    del n_actions  # onehots/avail masks are derived from (u, padded)
    data = {
        "o_ext": jnp.zeros((S, T + 1, N * obs_dim), obs_dtype),
        "u": jnp.zeros((S, T, N), jnp.int8),
        "r": jnp.zeros((S, T), jnp.float32),
        "padded": jnp.zeros((S, T), bool),
        "terminated": jnp.zeros((S, T), bool),
    }
    if state_dim is not None:
        data["s_ext"] = jnp.zeros((S, T + 1, state_dim), jnp.int8)
    return ReplayState(data=data, cursor=jnp.int32(0), size=jnp.int32(0))


def _flatten_episodes(episodes: dict) -> dict:
    """Rollout layout (B, T, N, .) -> merged storage layout."""
    out = {}
    for k, v in episodes.items():
        if k == "o_ext":
            out[k] = v.reshape(v.shape[0], v.shape[1], -1)
        elif k == "u":
            out[k] = v[..., 0]
        elif k in ("r", "padded", "terminated"):
            out[k] = v[..., 0]
        else:  # s_ext — already (B, T+1, state_dim)
            out[k] = v
    return out


def logical_views(data: dict) -> dict:
    """Merged storage layout -> the (b, T, N, .) views the learner eats.
    Pure reshapes (same linear order), so these are free under jit."""
    u = data["u"]
    N = u.shape[-1]
    o = data["o_ext"]
    out = {
        "o_ext": o.reshape(o.shape[:-1] + (N, o.shape[-1] // N)),
        "u": u[..., None],
        "r": data["r"][..., None],
        "padded": data["padded"][..., None],
        "terminated": data["terminated"][..., None],
    }
    if "s_ext" in data:
        out["s_ext"] = data["s_ext"]
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def _store_impl(replay: ReplayState, episodes: dict) -> ReplayState:
    episodes = _flatten_episodes(episodes)
    B = episodes["u"].shape[0]
    capacity = replay.data["u"].shape[0]
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


def store(replay: ReplayState, episodes: dict) -> ReplayState:
    """Ring-write a batch of B episodes (each array (B, T, ...)).

    The buffer PyTree is DONATED: XLA writes in place, so peak memory stays
    one buffer (a multi-GB buffer + functional copy would OOM the chip).
    The caller must rebind: ``rb = store(rb, eps)``."""
    return _store_impl(replay, episodes)


def make_local_store(mesh):
    """Fully device-local ring write for mesh training (``--local_sampling``).

    The default ``store`` scatters episodes to whichever device owns the
    global ring rows ``cursor..cursor+B`` — episodes collected on device d
    generally land on OTHER devices (cross-device traffic every cycle, and
    the ring fills device 0's shard first, so early shards are empty on
    most devices).  Here the capacity-sharded buffer is treated as
    ``n_dev`` INDEPENDENT local rings: each device ring-writes its own
    rollout shard (B/n episodes) at the shared local cursor — zero
    cross-device traffic, and every shard fills at the same rate, which is
    what makes per-device sampling (qlearn.learn_many local path) valid.
    Global ``cursor``/``size`` counters advance exactly like ``store``
    (B and capacity must both tile the mesh — Trainer rounds them).

    PAIRING INVARIANT: a buffer written with ``store_local`` must be
    sampled with ``make_local_sample`` (and vice versa).  The default
    global ``store`` fills the ring contiguously from row 0 — i.e. device
    0's shard first — so per-device sampling against it would read
    never-written zero rows on most shards; conversely ``store_local``
    leaves the tail of every shard empty until each LOCAL ring fills, so
    global uniform sampling over ``size`` rows would hit unwritten rows.
    ``Trainer`` pairs them via the single ``--local_sampling`` flag."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from marl_dmfb_tpu.parallel.mesh import BATCH_AXIS

    n = int(mesh.devices.size)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def store_local(replay: ReplayState, episodes: dict) -> ReplayState:
        eps = _flatten_episodes(episodes)
        B = eps["u"].shape[0]
        capacity = replay.data["u"].shape[0]

        def write(data_shard, eps_shard, cursor):
            cap_l = data_shard["u"].shape[0]
            b_l = eps_shard["u"].shape[0]
            idx = (cursor // n + jnp.arange(b_l)) % cap_l
            return {
                k: v.at[idx].set(eps_shard[k].astype(v.dtype))
                for k, v in data_shard.items()
            }

        data = shard_map(
            write, mesh=mesh,
            in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P()),
            out_specs=P(BATCH_AXIS),
        )(replay.data, eps, replay.cursor)
        return ReplayState(
            data=data,
            cursor=(replay.cursor + B) % capacity,
            size=jnp.minimum(replay.size + B, capacity),
        )

    return store_local


def make_local_sample(mesh, batch_size: int):
    """Per-device minibatch sampling for ``--local_sampling``.

    Each device draws its ``batch_size / n_dev`` share from ITS OWN
    capacity shard's valid rows — no cross-device episode gather at all
    (the global path all-gathers the whole minibatch over ICI every
    update).  Stratified-uniform across devices instead of global-uniform:
    the same marginal episode distribution when shards fill at the same
    rate, which ``make_local_store`` guarantees.

    PAIRING INVARIANT (see ``make_local_store``): only valid on a buffer
    written by ``make_local_store``.  Against the default global ``store``
    — which fills device 0's shard first — most shards' "valid" rows would
    be never-written zeros and the learner would silently train on empty
    episodes.

    Returns ``sample_local(replay_data, replay_size, key) -> dict`` in the
    merged storage layout, batch-axis sharded (run ``logical_views`` on it
    for the learner)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from marl_dmfb_tpu.parallel.mesh import BATCH_AXIS

    n = int(mesh.devices.size)
    if batch_size % n:
        raise ValueError(
            f"local sampling: batch_size ({batch_size}) must tile the "
            f"{n}-device mesh"
        )

    def sample_shard(data_shard, size, key):
        d = jax.lax.axis_index(BATCH_AXIS)
        cap_l = data_shard["u"].shape[0]
        local_size = jnp.clip(size // n, 1, cap_l)
        idx = jax.random.randint(
            jax.random.fold_in(key, d), (batch_size // n,), 0, local_size
        )
        return {k: v[idx] for k, v in data_shard.items()}

    return shard_map(
        sample_shard, mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(), P()),
        out_specs=P(BATCH_AXIS),
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
    return logical_views({k: v[idx] for k, v in replay.data.items()})
