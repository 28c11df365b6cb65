"""Episode-batch TD learner for VDN and QMIX.

Re-design of the reference's ``policy/vdn.py``/``policy/qmix.py``: the whole
learn step — eval/target GRU unrolls over the episode time axis, chosen-Q
gather, masked target max, mixing, masked TD loss, Adam with global-norm
clip, cadenced hard target sync — is ONE jitted pure function over a
``LearnerState`` PyTree.  BPTT is a ``lax.scan`` over time (the reference
unrolls a Python loop of GRUCell calls with per-step host->GPU copies,
vdn.py:167-196).

Loss parity notes:
* eval-stream input at t is ``o_next[t-1]`` for t>0 and ``o[0]`` at t=0,
  with the previous action's onehot (vdn.py:134-165);
* target-stream input at t is ``(o_next[t], u_onehot[t])`` (vdn.py:175-184);
* target Qs with unavailable actions get -9999999 before the max
  (vdn.py:109-110);
* loss = sum((mask * td)^2) / sum(mask) (vdn.py:118-122) — the reference's
  truncation of the batch to ``max_episode_len`` (agent/agent.py:63-70) is
  unnecessary under this masking (identical loss value) and would retrigger
  XLA compilation per length, so episodes keep the full static T;
* Adam betas (0.9, 0.99) (vdn.py:67-68), grads clipped by global norm
  BEFORE Adam like torch's clip_grad_norm_ + step (vdn.py:124-128);
* hard target sync every ``target_update_cycle`` learn steps, skipping step
  0 (vdn.py:130-132).

QMIX uses the state-conditioned monotonic mixer on the (new, first-class)
global state tensors ``s``/``s_next``; the reference wires QMIX but never
collects a state, so it crashes as shipped (SURVEY §2.2) — here it trains.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from marl_dmfb_tpu.models.networks import QMixer, build_agent_net, vdn_mix


class LearnerState(NamedTuple):
    params: dict            # {"agent": ..., "mixer": ... or None}
    target_params: dict
    opt_state: optax.OptState
    train_step: jax.Array   # () int32


def make_optimizer(args) -> optax.GradientTransformation:
    """Optimizer choice per config (vdn.py:61-70).

    ``args.lr_decay`` (TPU-native addition, off by default for reference
    parity) applies a cosine decay to 5% of the base lr over the estimated
    total update count — large-batch training (B >= 64) otherwise drifts
    late in training and long-horizon zero-shot quality (50x50) oscillates
    between checkpoints."""
    lr = args.lr
    if getattr(args, "lr_decay", False):
        # updates_total ~= env_steps * train_time / (n_episodes *
        # counted-steps-per-episode); counted steps average roughly
        # 0.75*episode_limit over a run (failures count the full limit,
        # rollout.py:147-149).  The estimate only shapes the schedule tail.
        est_steps_per_ep = max(1, int(0.75 * args.episode_limit))
        total_updates = max(1, int(
            args.total_env_steps * args.train_time
            / (args.n_episodes * est_steps_per_ep)
        ))
        lr = optax.cosine_decay_schedule(
            args.lr, decay_steps=total_updates, alpha=0.05
        )
    clip = optax.clip_by_global_norm(args.grad_norm_clip)
    if args.optimizer == "RMS":
        opt = optax.rmsprop(lr)
    elif args.optimizer == "SGD":
        opt = optax.sgd(lr)
    else:  # ADAM / ASGD both map to Adam in the reference
        opt = optax.adam(lr, b1=0.9, b2=0.99)
    return optax.chain(clip, opt)


def _scan_unroll(args) -> int:
    """Effective unroll factor for the BPTT time scans.

    ``--scan_unroll=0`` (the default) auto-selects: FULLY unroll short
    horizons — measured on the v5e, full unroll is ~20% faster per update
    at T=40 (2.48 vs 3.08 ms, batch 128) but only ~5% at T=80 while
    compile time keeps growing (partial unrolls that don't divide T, e.g.
    16 into 40, measured SLOWER than no unroll) — and leave longer scans
    rolled.  An explicit value is used as-is.

    Auto mode only unrolls on TPU: the XLA:CPU backend compiles a fully
    unrolled T=40 BPTT body under 8-device SPMD partitioning for >1 hour
    (measured round 3 — the virtual-mesh quality run sat in one LLVM
    compile), and CPU runs are tests/virtual-mesh substitutes where
    per-update speed doesn't matter."""
    su = getattr(args, "scan_unroll", 0)
    if su and su > 0:
        return su
    import jax

    if jax.default_backend() == "cpu":
        return 1
    T = getattr(args, "episode_limit", 0)
    return T if 0 < T <= 64 else 1


def make_learner(args, env, mesh=None):
    """Build (init_fn, learn_fn) for args.alg in {vdn, qmix}.

    ``mesh``: when training data-parallel over a device mesh, the fused
    ``learn_many`` constrains its sampled minibatches to batch-axis
    sharding — see the note inside ``learn_many``."""
    net = build_agent_net(args)
    if (mesh is not None and getattr(args, "local_sampling", False)
            and args.batch_size % int(mesh.devices.size)):
        raise ValueError(
            f"--local_sampling: batch_size ({args.batch_size}) must tile "
            f"the {int(mesh.devices.size)}-device mesh"
        )
    use_qmix = args.alg == "qmix"
    mixer = (
        QMixer(
            n_agents=args.n_agents,
            state_dim=args.state_shape,
            qmix_hidden=args.qmix_hidden_dim,
            hyper_hidden=args.hyper_hidden_dim,
            two_hyper_layers=args.two_hyper_layers,
        )
        if use_qmix
        else None
    )
    N, A, H = args.n_agents, args.n_actions, args.rnn_hidden_dim
    obs_dim = args.obs_shape[-1]
    in_dim = obs_dim + (A if args.last_action else 0)
    opt = make_optimizer(args)

    def init(key) -> LearnerState:
        k1, k2 = jax.random.split(key)
        dummy_x = jnp.zeros((1, in_dim))
        dummy_h = jnp.zeros((1, H))
        agent_params = net.init(k1, dummy_x, dummy_h)["params"]
        params = {"agent": agent_params}
        if use_qmix:
            dummy_q = jnp.zeros((1, 1, N))
            dummy_s = jnp.zeros((1, 1, args.state_shape))
            params["mixer"] = mixer.init(k2, dummy_q, dummy_s)["params"]
        target_params = jax.tree.map(lambda x: x, params)
        return LearnerState(
            params=params,
            target_params=target_params,
            opt_state=opt.init(params),
            train_step=jnp.int32(0),
        )

    def unroll(agent_params, inputs):
        """GRU unroll over time: inputs (b, T, N, in_dim) -> q (b, T, N, A).

        The WHOLE net (conv encoder + GRU + Q head) runs inside the
        lax.scan body on (b*N)-row batches.  The "obvious" TPU optimization
        — batching the time-independent encoder/head over all b*T*N samples
        and scanning only the GRU cell — was implemented and measured 4x
        SLOWER on the v5e (fwd+bwd 7.06ms vs 1.71ms, batch 128, T=40,
        fov 9): XLA fuses the small per-step convs into the scan and keeps
        activations in VMEM, while the big-batch encoder materializes
        channel-padded conv activations (24 ch padded to 128 lanes, ~5x)
        through HBM.  Refuted-optimization record: RESULTS.md, Profiling."""
        b, T = inputs.shape[0], inputs.shape[1]

        def cell(h, x_t):
            q, h2 = net.apply({"params": agent_params}, x_t, h)
            return h2, q

        if getattr(args, "remat", False):
            # rematerialize per-timestep activations in the backward pass:
            # large configs (MEDA 80x80-10d: T=160, 10 agents, fov 19)
            # otherwise hold ~6GB of conv/GRU activations for BPTT
            cell = jax.checkpoint(cell)
        x_tb = inputs.transpose(1, 0, 2, 3).reshape(T, b * N, -1)
        h0 = jnp.zeros((b * N, H), jnp.float32)
        _, q_t = jax.lax.scan(cell, h0, x_tb, unroll=_scan_unroll(args))
        return q_t.reshape(T, b, N, A).transpose(1, 0, 2, 3)

    def unroll_pair(eval_params, target_params, eval_in, tgt_in):
        """Eval + target streams in ONE scan: both rows batch into the same
        per-step net call (one set of matmuls at 2x rows instead of two
        scans at 1x) — the streams share shapes but not params, so they
        concatenate on the batch axis per step with their own param trees
        applied via a stacked vmap.  Returns (q_eval, q_target), each
        (b, T, N, A); exactly equal to two separate unroll() calls."""
        b, T = eval_in.shape[0], eval_in.shape[1]
        params2 = jax.tree.map(
            lambda a, t: jnp.stack([a, t]), eval_params, target_params
        )
        x2 = jnp.stack([eval_in, tgt_in])           # (2, b, T, N, in)
        x2 = x2.transpose(2, 0, 1, 3, 4).reshape(T, 2, b * N, -1)

        apply2 = jax.vmap(
            lambda p, x, h: net.apply({"params": p}, x, h),
            in_axes=(0, 0, 0),
        )

        def cell(h2, x_t):
            q, h_next = apply2(params2, x_t, h2)
            return h_next, q

        if getattr(args, "remat", False):
            cell = jax.checkpoint(cell)
        h0 = jnp.zeros((2, b * N, H), jnp.float32)
        _, q_t = jax.lax.scan(
            cell, h0, x2, unroll=_scan_unroll(args)
        )                                            # (T, 2, b*N, A)
        q_t = q_t.reshape(T, 2, b, N, A).transpose(1, 2, 0, 3, 4)
        return q_t[0], q_t[1]

    def build_inputs(batch, u_onehot):
        # o_ext stores o and o_next as one length-(T+1) array (see
        # replay.init_replay): eval-stream obs at t is exactly
        # o_ext[:, :T] == [o[0], o_next[0..T-2]] (vdn.py:139-148), the
        # target stream's is o_ext[:, 1:] == o_next.
        o_ext = batch["o_ext"].astype(jnp.float32)
        eval_obs = o_ext[:, :-1]
        tgt_obs = o_ext[:, 1:]
        prev_u = jnp.concatenate(
            [jnp.zeros_like(u_onehot[:, :1]), u_onehot[:, :-1]], axis=1
        )
        if args.last_action:
            eval_in = jnp.concatenate([eval_obs, prev_u], axis=-1)
            tgt_in = jnp.concatenate([tgt_obs, u_onehot], axis=-1)
        else:
            eval_in, tgt_in = eval_obs, tgt_obs
        return eval_in, tgt_in

    def loss_fn(params, target_params, batch):
        u = batch["u"].astype(jnp.int32)                     # (b,T,N,1)
        r = batch["r"].astype(jnp.float32)                   # (b,T,1)
        terminated = batch["terminated"].astype(jnp.float32)
        mask = 1.0 - batch["padded"].astype(jnp.float32)     # (b,T,1)
        # derived tensors (not stored; see replay.init_replay): the action
        # onehots are one_hot(u) masked to zero on padded steps, and the
        # availability mask is all-ones on live steps / zero on padded —
        # exactly what the reference stores (rollout.py:26-31, 137-139).
        u_onehot = jax.nn.one_hot(u[..., 0], A) * mask[..., None]
        avail_next = jnp.broadcast_to(
            mask[..., None], u_onehot.shape
        )
        eval_in, tgt_in = build_inputs(batch, u_onehot)

        if getattr(args, "fused_streams", False):
            q_evals, q_targets = unroll_pair(
                params["agent"], target_params["agent"], eval_in, tgt_in
            )
        else:
            q_evals = unroll(params["agent"], eval_in)
            q_targets = unroll(target_params["agent"], tgt_in)
        q_e = jnp.take_along_axis(q_evals, u, axis=3).squeeze(3)   # (b,T,N)
        q_t = jnp.where(avail_next == 0.0, -9999999.0, q_targets).max(axis=3)

        if use_qmix:
            s_ext = batch["s_ext"].astype(jnp.float32)
            q_tot_e = mixer.apply(
                {"params": params["mixer"]}, q_e, s_ext[:, :-1]
            )
            q_tot_t = mixer.apply(
                {"params": target_params["mixer"]}, q_t, s_ext[:, 1:]
            )
        else:
            q_tot_e = vdn_mix(q_e)
            q_tot_t = vdn_mix(q_t)

        targets = r + args.gamma * q_tot_t * (1.0 - terminated)
        td = (jax.lax.stop_gradient(targets) - q_tot_e) * mask
        return jnp.sum(td ** 2) / jnp.sum(mask)

    def _update(state: LearnerState, batch: dict):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.target_params, batch
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        train_step = state.train_step + 1
        sync = (train_step % args.target_update_cycle == 0) & (train_step > 0)
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), state.target_params, params
        )
        return (
            LearnerState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                train_step=train_step,
            ),
            loss,
        )

    learn = jax.jit(_update)

    if mesh is not None and getattr(args, "local_sampling", False):
        from marl_dmfb_tpu.replay import make_local_sample

        local_sample = make_local_sample(mesh, args.batch_size)
    else:
        local_sample = None

    @functools.partial(jax.jit, static_argnames=("n_updates",))
    def learn_many(state: LearnerState, replay_data: dict, replay_size,
                   key, n_updates: int):
        """K sample+update steps fused in one XLA program (one dispatch
        instead of K host round-trips; per-call latency dominates K
        sequential `learn` calls on a tunneled device).

        With ``--local_sampling`` the minibatches are drawn per device via
        ``replay.make_local_sample`` — ONLY valid when ``replay_data`` was
        filled by ``replay.make_local_store`` (equal per-shard fill; the
        default global ``store`` fills device 0's shard first, and per-
        device sampling against it would silently train on never-written
        zero episodes from most shards — see the pairing invariant in
        replay.py).  Trainer pairs the two via the single flag; direct API
        callers must do the same."""

        def body(state, k):
            from marl_dmfb_tpu.replay import logical_views

            if local_sample is not None:
                # Fully device-local sampling: zero cross-device replay
                # traffic per update (the global path all-gathers the
                # whole minibatch over ICI every update).
                raw = local_sample(replay_data, replay_size, k)
                return _update(state, logical_views(raw))

            idx = jax.random.randint(
                k, (args.batch_size,), 0, jnp.maximum(replay_size, 1)
            )
            batch = logical_views(
                {kk: v[idx] for kk, v in replay_data.items()}
            )
            if mesh is not None:
                # GSPMD resolves the random gather from the
                # capacity-sharded replay by REPLICATING its output, and
                # then partitions the whole update in the slow replicated
                # regime (measured 23.0s vs 2.5s per update on the
                # 8-virtual-device CPU mesh, identical math).  Pin the
                # minibatch back to batch-axis sharding — same values,
                # same indices, only the layout changes — so the update
                # runs data-parallel with the usual grad psum.
                from jax.sharding import NamedSharding, PartitionSpec
                from marl_dmfb_tpu.parallel.mesh import BATCH_AXIS

                spec = NamedSharding(mesh, PartitionSpec(BATCH_AXIS))
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, spec),
                    batch,
                )
            return _update(state, batch)

        keys = jax.random.split(key, n_updates)
        state, losses = jax.lax.scan(body, state, keys)
        return state, jnp.mean(losses)

    # loss_fn is returned for forward-only profiling (profile_cycle.py)
    return init, learn, net, learn_many, loss_fn
