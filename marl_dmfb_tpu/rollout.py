"""On-device episode rollout: the whole actor loop (obs -> net -> action ->
env step) fused in one jitted ``lax.scan`` over time, batched over B envs.

Re-design of the reference's per-step Python loop
(``common/rollout.py:101-150``), which crossed the host/device boundary
twice per agent per step (agent.py:36-38).  Here a rollout of B envs x T
steps is a single XLA program; B is the parallelism axis to shard over a
mesh.

Episode semantics preserved:

* episodes run to ``terminated`` then are frozen; remaining steps are stored
  zeroed with ``padded=1``/``terminated=1`` (rollout.py:131-141);
* team reward is the mean over agents (rollout.py:33), terminated is
  all-agents (rollout.py:34), availability masks are all-ones
  (rollout.py:22);
* epsilon anneals per *executed* env step within the scan (the decrement is
  scaled by the live fraction of the batch, so terminated episodes stop
  consuming schedule exactly like the reference's per-step anneal) and the
  final value is returned for the trainer to carry across rollouts
  (rollout.py:113-115, 126-127, 146);
* metrics: failed episodes count as ``episode_limit`` steps
  (rollout.py:147-149).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from marl_dmfb_tpu.envs.registry import Env


class RolloutResult(NamedTuple):
    episodes: dict          # each (B, T, ...) — replay-buffer layout
    env_states: object      # batched env state PyTree (post-episode)
    epsilon: jax.Array      # () f32 — annealed epsilon after this rollout
    # per-episode metrics, each (B,)
    reward: jax.Array
    steps: jax.Array
    constraints: jax.Array
    success: jax.Array


def _tree_where(cond_b: jax.Array, a, b):
    def sel(x, y):
        c = cond_b.reshape(cond_b.shape + (1,) * (x.ndim - 1))
        return jnp.where(c, x, y)

    return jax.tree.map(sel, a, b)


_CHUNK_ROWS = 32768   # the v5e knee sits at 65536 rows; target half of it
_MAX_CHUNKS = 16      # hard cap: chunks are unrolled into the traced scan body


def _net_chunks(rows: int) -> int:
    """Chunk count for the per-step net forward at very large actor batches.

    Measured on the v5e (RESULTS.md "Actor roofline"): the CRNN forward's
    per-row cost jumps ~1.8x once the flattened row count exceeds 65536
    (2^16) — at B*N = 131072 rows the T=40 forward scan costs 244 ms
    monolithic vs 65 ms split into 4 x 32768-row applies (bitwise-identical
    math; only the batch dim is split).  Below the knee (or off-TPU, where
    no such cliff exists) stay monolithic.

    The count is capped at ``_MAX_CHUNKS``: each chunk is a separate
    ``net.apply`` unrolled into the traced program, so an adversarial row
    count must never explode the chunk count (a semiprime like
    2*65537 = 131074 would otherwise select 65537 two-row applies — a
    compile-time bomb).  An exact divisor near ceil(rows/32768) is
    preferred (no padding, bitwise-identical to monolithic); otherwise the
    forward pads the batch dim up to ``chunks * ceil(rows/chunks)`` rows
    and trims after — chunks then sit slightly above 32768 rows, still far
    below the 65536 cliff for any realistic batch."""
    if rows <= _CHUNK_ROWS:
        return 1
    import jax

    if jax.default_backend() != "tpu":
        return 1
    n = -(-rows // _CHUNK_ROWS)
    for cand in range(n, min(_MAX_CHUNKS, n + 4) + 1):
        if rows % cand == 0:
            return cand
    return min(n, _MAX_CHUNKS)


def make_rollout(
    env: Env,
    net,
    rnn_hidden: int,
    with_state: bool = False,
    reset_new: bool = False,
    mesh_sharded: bool = False,
):
    """Build ``rollout(theta, env_states, key, epsilon, anneal, min_eps,
    greedy)`` — a pure function suitable for ``jax.jit`` (greedy is static).

    ``mesh_sharded``: set when the rollout batch is sharded over a device
    mesh.  The large-batch net-forward chunking is then disabled: chunk
    boundaries are static batch-axis slices that need not align with shard
    boundaries (GSPMD would insert resharding inside the hot per-step
    forward), and the 2^16-row cliff is per DEVICE — per-device rows are
    B*N/n_dev, below the knee for any realistic sharded config."""
    N, A, T = env.n_agents, env.n_actions, env.episode_limit

    # The net eats ONE concatenated f32 input row per agent.  A split-input
    # variant (raw int8 obs + onehot fed separately, skipping the in-scan
    # concat materialization) was built and REFUTED on the v5e: runtime
    # -2% on the net-only scan (90.9 vs 92.8 ms) but the int8 loop operand
    # blows XLA:TPU compile up 28x (139 s net-only; the full fused rollout
    # did not finish compiling in 27 minutes vs ~15 s for this path).
    # RESULTS.md "Actor roofline (round 4)".
    def net_forward(theta, obs, last_oh, h):
        B = obs.shape[0]
        rows = B * N
        hh = h.reshape(rows, rnn_hidden)
        ins = (jnp.concatenate(
            [obs.astype(jnp.float32), last_oh], axis=-1
        ).reshape(rows, -1),)
        apply = functools.partial(net.apply, {"params": theta})
        n_chunks = 1 if mesh_sharded else _net_chunks(rows)
        if n_chunks > 1:
            c = -(-rows // n_chunks)
            pad = n_chunks * c - rows
            if pad:  # non-dividing chunk count: pad batch dim, trim after
                ins = tuple(
                    jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
                    ) for x in ins
                )
                hh = jnp.concatenate(
                    [hh, jnp.zeros((pad, rnn_hidden), hh.dtype)]
                )
            outs = [
                apply(*(x[i * c:(i + 1) * c] for x in ins),
                      hh[i * c:(i + 1) * c])
                for i in range(n_chunks)
            ]
            q = jnp.concatenate([o[0] for o in outs])[:rows]
            h2 = jnp.concatenate([o[1] for o in outs])[:rows]
        else:
            q, h2 = apply(*ins, hh)
        return q.reshape(B, N, A), h2.reshape(B, N, rnn_hidden)

    @functools.partial(jax.jit, static_argnames=("greedy",))
    def rollout(
        theta,
        env_states,
        key: jax.Array,
        epsilon: jax.Array,
        anneal_per_step: jax.Array,
        min_epsilon: jax.Array,
        greedy: bool = False,
    ) -> RolloutResult:
        env_states = jax.vmap(lambda s: env.reset(s, new=reset_new))(env_states)
        obs0 = jax.vmap(env.observe)(env_states)
        B = obs0.shape[0]

        def step_fn(carry, _):
            states, obs, last_oh, h, live, eps, k = carry
            k, k_rand, k_expl = jax.random.split(k, 3)
            q, h2 = net_forward(theta, obs, last_oh, h)
            greedy_a = jnp.argmax(q, axis=-1).astype(jnp.int32)
            if greedy:
                a = greedy_a
            else:
                rand_a = jax.random.randint(k_rand, (B, N), 0, A, jnp.int32)
                explore = jax.random.uniform(k_expl, (B, N)) < eps
                a = jnp.where(explore, rand_a, greedy_a)
            new_states, out = jax.vmap(env.step)(states, a)
            states2 = _tree_where(live, new_states, states)

            onehot = jax.nn.one_hot(a, A, dtype=jnp.float32)
            lv = live
            lv3 = lv[:, None, None]
            # stored tensors are minimal: availability masks and action
            # onehots are derivable from (u, padded) and reconstructed at
            # learn time (replay.init_replay docstring)
            trans = {
                "o_next": jnp.where(lv3, out.obs, 0),
                "u": jnp.where(lv3, a[..., None], 0),
                "r": jnp.where(lv, out.team_reward, 0.0)[:, None],
                "padded": (~lv)[:, None],
                "terminated": jnp.where(lv, out.terminated, True)[:, None],
            }
            if with_state:
                s_next = jax.vmap(env.global_state)(new_states)
                trans["s_next"] = jnp.where(lv[:, None], s_next, 0.0)

            metrics = (
                jnp.where(lv, out.team_reward, 0.0),
                lv.astype(jnp.int32),
                jnp.where(lv, out.constraints, 0),
                jnp.where(lv, out.success, 0),
            )
            live_next = live & ~out.terminated
            # anneal per EXECUTED env step: the reference decrements epsilon
            # only while the episode is running (rollout.py:113-115,126-127),
            # so scale the batched decrement by the live fraction — terminated
            # (padded) episodes stop consuming schedule.
            live_frac = jnp.mean(live.astype(jnp.float32))
            eps_next = eps if greedy else jnp.maximum(
                min_epsilon, eps - anneal_per_step * live_frac
            )
            # The obs/last-action carries are NOT frozen for terminated
            # episodes: every stored tensor and metric is already
            # live-masked, and the env state IS frozen (states2), so the
            # q-values/actions computed on dead rows are unobservable —
            # the rollout's outputs are bitwise-identical with or without
            # freezing these carries, and dropping the two selects saves
            # a (B,N,obs) int8 + (B,N,A) f32 select per scan step.
            new_obs = out.obs
            new_last = onehot
            return (
                (states2, new_obs, new_last, h2, live_next, eps_next, k),
                (trans, metrics),
            )

        h0 = jnp.zeros((B, N, rnn_hidden), jnp.float32)
        last0 = jnp.zeros((B, N, A), jnp.float32)
        live0 = jnp.ones((B,), bool)
        carry0 = (env_states, obs0, last0, h0, live0, epsilon, key)
        (states_f, _, _, _, _, eps_f, _), (trans_t, metrics_t) = jax.lax.scan(
            step_fn, carry0, None, length=T
        )
        # (T, B, ...) -> (B, T, ...)
        episodes = {
            k: jnp.moveaxis(v, 0, 1) for k, v in trans_t.items()
        }
        # o/o_next as one length-(T+1) array (see replay.init_replay)
        episodes["o_ext"] = jnp.concatenate(
            [obs0[:, None], episodes.pop("o_next")], axis=1
        )
        if with_state:
            s0 = jax.vmap(env.global_state)(env_states)
            episodes["s_ext"] = jnp.concatenate(
                [s0[:, None], episodes.pop("s_next")], axis=1
            )
        rew_t, live_t, cons_t, succ_t = metrics_t
        reward = jnp.sum(rew_t, axis=0)
        exec_steps = jnp.sum(live_t, axis=0)
        success = (jnp.sum(succ_t, axis=0) > 0).astype(jnp.int32)
        steps = jnp.where(success == 1, exec_steps, T)  # rollout.py:147-149
        constraints = jnp.sum(cons_t, axis=0)
        return RolloutResult(
            episodes=episodes,
            env_states=states_f,
            epsilon=eps_f,
            reward=reward,
            steps=steps.astype(jnp.int32),
            constraints=constraints.astype(jnp.int32),
            success=success,
        )

    return rollout


def summarize_eval(result: RolloutResult) -> dict:
    """Average the per-episode metrics the way the reference's
    ``Evaluator.evaluate`` does (rollout.py:69-85)."""
    return {
        "reward": float(jnp.mean(result.reward)),
        "steps": float(jnp.mean(result.steps.astype(jnp.float32))),
        "constraints": float(jnp.mean(result.constraints.astype(jnp.float32))),
        "success_rate": float(jnp.mean(result.success.astype(jnp.float32))),
    }
