"""Vmapped multi-seed training ("seed farm"): K independent trainings of
the same config as ONE jitted program.

The reference answers "is this recipe seed-stable?" by rerunning
``train.py`` K times (multiTrain.py runs configs back-to-back,
multiTrain.py:8-23).  On TPU the learner at study-scale batches uses a
fraction of the chip, so the K runs ``jax.vmap`` over a leading seed axis
instead: params, env states, replay rings and epsilon all carry ``(S, ...)``
and every collect+learn cycle advances ALL seeds in lockstep for roughly
the cost of one.

Key discipline: seed ``i`` uses exactly the PRNG stream of a single-seed
``Trainer`` constructed with ``seed = args.seed + i`` (same split
structure, two training draws per cycle) — ``tests/test_seedfarm.py``
asserts the first training cycle matches ``Trainer(seed+i)`` to ~1 ULP
(identical draws; vmap changes XLA's lowering of the batched reductions,
so exact bitwise equality across vmap is not guaranteed).
Two lockstep-induced differences from truly independent runs, both
eval-side only: the eval cadence fires on the MEAN env-step count across
seeds, and eval task draws come from a dedicated per-seed stream (a
single-seed Trainer interleaves them into its main stream).  Training
dynamics are otherwise draw-for-draw those of K independent runs.

Artifacts per seed ``i``: full-state checkpoints at
``model/<alg>/fov<f>/{i}_<tag>_state`` (loadable by ``evaluate.py
--ith_run=i``) and curve npys with the trainer's filenames; plus a stacked
``..._farm.npy`` matrix of all seeds' curves.

Resume: each eval cycle also writes one FARM checkpoint
(``farm_<E>_resume``: stacked learner states, EMA, epsilon, PRNG streams,
train+eval env states, curve history; the two most recent are kept so a
kill mid-save still leaves a valid one).  ``--load_model`` restores the
latest and continues — a wedge-killed farm run loses at most one eval
cycle (VERDICT r4 #3).  With ``--ckpt_replay`` the replay rings are
included and the continuation is BIT-EXACT (identical trajectories to an
uninterrupted run, wear maps preserved); without it the rings restart
empty, mirroring the single-run Trainer's resume contract
(trainer.py:336-350).
"""

from __future__ import annotations

import os
import re
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from marl_dmfb_tpu import checkpoint as ckpt
from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.rollout import make_rollout, summarize_eval


def _resume_tags(model_dir: str) -> list:
    """Eval-cycle tags of the farm resume checkpoints on disk, ascending."""
    if not os.path.isdir(model_dir):
        return []
    tags = []
    for d in os.listdir(model_dir):
        m = re.fullmatch(r"farm_(\d+)_resume", d)
        if m:
            tags.append(int(m.group(1)))
    return sorted(tags)


def run_farm(args, env, n_seeds: int):
    """Train ``n_seeds`` independent seeds of ``args`` simultaneously."""
    assert n_seeds >= 1
    use_state = args.alg == "qmix"
    init, learn, net, learn_many, _ = make_learner(args, env)
    rollout = make_rollout(env, net, args.rnn_hidden_dim,
                           with_state=use_state)
    B = args.rollout_batch
    S = n_seeds
    updates = max(1, round(args.train_time * B / args.n_episodes))
    T = args.episode_limit

    # per-seed key streams, mirroring Trainer.__init__ exactly
    base = jnp.stack([jax.random.PRNGKey(args.seed + i) for i in range(S)])
    k_learn, k_envs, k_eval, keys = [], [], [], []
    for i in range(S):
        _, kl, ke, kv, kk = jax.random.split(base[i], 5)
        k_learn.append(kl), k_envs.append(ke), k_eval.append(kv)
        keys.append(kk)
    k_learn, k_envs = jnp.stack(k_learn), jnp.stack(k_envs)
    k_eval, keys = jnp.stack(k_eval), jnp.stack(keys)

    lstates = jax.vmap(init)(k_learn)

    def init_states(k, n):
        return jax.vmap(env.init)(jax.random.split(k, n))

    states = jax.vmap(lambda k: init_states(k, B))(k_envs)       # (S, B, ..)
    eval_states = jax.vmap(
        lambda k: init_states(k, args.evaluate_task)
    )(k_eval)

    rb1 = replay_lib.init_replay(
        capacity=args.buffer_size, episode_limit=T,
        n_agents=args.n_agents, obs_dim=args.obs_shape[-1],
        n_actions=args.n_actions,
        obs_dtype=env.params.obs_dtype,
        state_dim=args.state_shape if use_state else None,
    )
    rbs = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), rb1)

    eps = jnp.full((S,), args.epsilon, jnp.float32)
    if args.epsilon_anneal_scale == "step":
        anneal = jnp.float32(
            (args.epsilon - args.min_epsilon) / args.anneal_steps * B
        )
    else:
        anneal = jnp.float32(0.0)
    min_eps = jnp.float32(args.min_epsilon)

    ema = None
    if args.param_ema:
        ema = lstates.params
        cycle_decay = float(args.param_ema) ** updates

    def next_keys(ks):
        both = jax.vmap(jax.random.split)(ks)
        return both[:, 0], both[:, 1]

    # No donation: several farm inputs alias at init (target_params is the
    # params tree, the all-zero per-seed rings constant-dedupe to one
    # buffer) and donating aliased buffers is an XLA error.  The farm pays
    # one transient copy of its state per cycle — fine at study-scale
    # configs; not intended for MEDA-sized replay buffers.
    @jax.jit
    def farm_cycle(lstates, states, rbs, eps, k1s, k2s):
        # two key draws per cycle, mirroring Trainer.train_cycle's two
        # _next_key() calls (rollout key, learn_many key)
        def one(lstate, st, rb, e, k1, k2):
            res = rollout(lstate.params["agent"], st, k1, e, anneal,
                          min_eps, greedy=False)
            rb = replay_lib.store(rb, res.episodes)
            lstate, loss = learn_many(lstate, rb.data, rb.size, k2, updates)
            return (lstate, res.env_states, rb, res.epsilon,
                    jnp.sum(res.steps), loss)

        return jax.vmap(one)(lstates, states, rbs, eps, k1s, k2s)

    @jax.jit
    def farm_eval(params, ev_states, ks):
        def one(p, st, k):
            res = rollout(p["agent"], st, k, jnp.float32(0.0),
                          jnp.float32(0.0), jnp.float32(0.0), greedy=True)
            return res.env_states, (res.reward, res.steps, res.constraints,
                                    res.success)

        return jax.vmap(one)(params, ev_states, ks)

    if ema is not None:
        @jax.jit
        def ema_step(e, p):
            return jax.tree.map(
                lambda a, b: cycle_decay * a + (1.0 - cycle_decay) * b, e, p
            )

    model_dir = os.path.join(args.data_dir, args.model_dir.lstrip("./"),
                             args.alg, f"fov{args.fov}")
    save_path = os.path.join(
        args.data_dir, args.result_dir.lstrip("./"), args.alg,
        f"fov{args.fov}",
        f"{args.width}by{args.length}-{args.drop_num}d{args.block_num}b",
    )
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(save_path, exist_ok=True)

    def save_seed(i, tag, lstates, eps, ks):
        sl = lambda x: jax.tree.map(lambda v: np.asarray(v[i]), x)
        tree = {
            "learner": sl(lstates._asdict()),
            **({"ema": sl(ema)} if ema is not None else {}),
            "epsilon": np.asarray(eps[i]),
            "key": np.asarray(ks[i]),
            "net_config": {
                "net": args.net,
                "rnn_hidden_dim": args.rnn_hidden_dim,
                "hyper_hidden_dim": args.hyper_hidden_dim,
                "qmix_hidden_dim": args.qmix_hidden_dim,
            },
        }
        ckpt.save(os.path.join(model_dir, f"{i}_{tag}_state"), tree)

    time_steps = np.zeros(S, np.int64)
    evaluate_steps = -1
    success_hist, reward_hist, steps_hist, runtime = [], [], [], []
    elapsed0 = 0.0
    ckpt_replay = bool(getattr(args, "ckpt_replay", False))

    if getattr(args, "load_model", False):
        # resume from the latest farm checkpoint (see module docstring);
        # restore is key-path-strict via the Trainer's restructure helper so
        # a layout drift fails loudly rather than restoring garbage.
        from marl_dmfb_tpu.trainer import restructure_by_path

        tags = _resume_tags(model_dir)
        if not tags:
            raise FileNotFoundError(
                f"--load_model: no farm_<E>_resume checkpoint under "
                f"{model_dir}"
            )
        tree = path = resume_tag = None
        for t in reversed(tags):  # newest first; older one on corruption
            path = os.path.join(model_dir, f"farm_{t}_resume")
            try:
                tree, resume_tag = ckpt.restore(path), t
                break
            except Exception as e:
                print(f"farm resume: {path} unreadable ({e}); trying older",
                      flush=True)
        if tree is None:
            raise FileNotFoundError(
                f"--load_model: no readable farm checkpoint under "
                f"{model_dir} (tried {tags})"
            )
        if ckpt_replay != ("rbs" in tree):
            raise ValueError(
                f"farm resume at {path}: checkpoint "
                f"{'includes' if 'rbs' in tree else 'lacks'} replay rings "
                f"but --ckpt_replay is {'off' if ckpt_replay else 'on'} — "
                "resume with the same flag the run was started with"
            )
        lstates = type(lstates)(**restructure_by_path(
            lstates._asdict(), tree["lstates"], path))
        states = type(states)(**restructure_by_path(
            states._asdict(), tree["states"], path))
        eval_states = type(eval_states)(**restructure_by_path(
            eval_states._asdict(), tree["eval_states"], path))
        if ckpt_replay:
            rbs = type(rbs)(**restructure_by_path(
                rbs._asdict(), tree["rbs"], path))
        if ema is not None:
            ema = restructure_by_path(ema, tree["ema"], path)
        eps = jnp.asarray(tree["eps"])
        keys = jnp.asarray(tree["keys"])
        k_eval = jnp.asarray(tree["k_eval"])
        time_steps = np.asarray(tree["time_steps"]).astype(np.int64)
        c = tree["curves"]
        success_hist = [c["success"][:, j]
                        for j in range(c["success"].shape[1])]
        reward_hist = [c["reward"][:, j] for j in range(c["reward"].shape[1])]
        steps_hist = [c["steps"][:, j] for j in range(c["steps"].shape[1])]
        runtime = list(np.asarray(c["runtime"]))
        evaluate_steps = int(resume_tag)
        elapsed0 = float(runtime[-1])
        print(f"farm resume: restored {path} at eval cycle {evaluate_steps},"
              f" mean steps {int(time_steps.mean())}", flush=True)

    def save_farm(tag):
        # Closures read run_farm's CURRENT locals, so this always snapshots
        # the live state.  Host-side numpy copies: orbax serializes them
        # without per-leaf device RPCs over the tunnel.
        host = lambda t: jax.tree.map(np.asarray, t)
        tree = {
            "lstates": host(lstates._asdict()),
            "states": host(states._asdict()),
            "eval_states": host(eval_states._asdict()),
            "eps": np.asarray(eps),
            "keys": np.asarray(keys),
            "k_eval": np.asarray(k_eval),
            "time_steps": np.asarray(time_steps),
            "curves": {
                "success": np.stack(success_hist, axis=1),
                "reward": np.stack(reward_hist, axis=1),
                "steps": np.stack(steps_hist, axis=1),
                "runtime": np.asarray(runtime),
            },
            **({"ema": host(ema)} if ema is not None else {}),
            **({"rbs": host(rbs._asdict())} if ckpt_replay else {}),
        }
        ckpt.save(os.path.join(model_dir, f"farm_{tag}_resume"), tree)
        for old in _resume_tags(model_dir)[:-2]:
            shutil.rmtree(os.path.join(model_dir, f"farm_{old}_resume"),
                          ignore_errors=True)

    start = time.time() - elapsed0
    while time_steps.mean() < args.total_env_steps:
        if time_steps.mean() // args.evaluate_cycle > evaluate_steps:
            evaluate_steps += 1
            for i in range(S):
                save_seed(i, evaluate_steps, lstates, eps, keys)
            k_eval, sub = next_keys(k_eval)
            p = ema if ema is not None else lstates.params
            eval_states, (rew, stp, _, suc) = farm_eval(p, eval_states, sub)
            success_hist.append(np.asarray(jnp.mean(
                suc.astype(jnp.float32), axis=1)))
            reward_hist.append(np.asarray(jnp.mean(rew, axis=1)))
            steps_hist.append(np.asarray(jnp.mean(
                stp.astype(jnp.float32), axis=1)))
            runtime.append(time.time() - start)
            print(f"farm eval {evaluate_steps}: mean steps "
                  f"{int(time_steps.mean())}, success "
                  f"{np.round(success_hist[-1], 3)}", flush=True)
            save_farm(evaluate_steps)
        keys, k1s = next_keys(keys)
        keys, k2s = next_keys(keys)
        lstates, states, rbs, eps, dsteps, loss = farm_cycle(
            lstates, states, rbs, eps, k1s, k2s
        )
        if args.epsilon_anneal_scale == "episode":
            dec = B * (args.epsilon - args.min_epsilon) / args.anneal_steps
            eps = jnp.maximum(min_eps, eps - dec)
        if ema is not None:
            ema = ema_step(ema, lstates.params)
        time_steps += np.asarray(dsteps)

    for i in range(S):
        save_seed(i, "final", lstates, eps, keys)
    k_eval, sub = next_keys(k_eval)
    p = ema if ema is not None else lstates.params
    eval_states, (rew, stp, _, suc) = farm_eval(p, eval_states, sub)
    success_hist.append(np.asarray(jnp.mean(suc.astype(jnp.float32), axis=1)))
    reward_hist.append(np.asarray(jnp.mean(rew, axis=1)))
    steps_hist.append(np.asarray(jnp.mean(stp.astype(jnp.float32), axis=1)))
    runtime.append(time.time() - start)

    prefix = (f"{args.alg}_env({args.width},{args.length},{args.drop_num},"
              f"{args.block_num},{args.fov},{args.stall})")
    curves = {
        "success_rate": np.stack(success_hist, axis=1),   # (S, E)
        "Rewards": np.stack(reward_hist, axis=1),
        "steps": np.stack(steps_hist, axis=1),
        "runtime": np.asarray(runtime),
    }
    for name, arr in curves.items():
        np.save(os.path.join(save_path, f"{prefix}{name}_farm"), arr)
        if arr.ndim == 2:  # per-seed copies with trainer-style filenames
            for i in range(S):
                np.save(os.path.join(save_path, f"{prefix}{name}_{i}"),
                        arr[i])
    print(f"seed farm done: {S} seeds x {int(time_steps.mean())} env steps "
          f"in {time.time() - start:.1f}s; final success "
          f"{np.round(curves['success_rate'][:, -1], 3)}", flush=True)
    return curves
