"""Training driver: rollout -> replay -> learn loop with periodic
evaluation, checkpointing and metric curves.

Re-design of the reference ``train.py``'s Trainer: the same experiment
protocol (train until ``n_steps`` env steps, evaluate + checkpoint every
``evaluate_cycle`` steps, metrics npy/plots with the same filenames) driven
by jitted device-resident pieces:

* ``make_rollout`` collects B episodes per call in one fused scan;
* episodes are ring-written into the device replay buffer;
* ``learn`` runs gradient steps on uniformly sampled episode minibatches.

Vectorization bookkeeping vs the reference (single env, ``n_episodes=2``
sequential episodes per cycle, ``train_time`` updates per cycle,
train.py:59-78):

* B = ``args.rollout_batch`` episodes are collected per rollout;
* gradient updates per rollout are scaled to keep the reference's
  updates-per-collected-episode ratio: ``train_time * B / n_episodes``;
* epsilon anneals per *env step* across the whole batch (B steps of
  schedule per lockstep step), preserving the reference's
  anneal-over-``anneal_steps``-env-steps shape (rollout.py:113-115);
* the env-step budget counts failed episodes as ``episode_limit`` steps,
  exactly like the reference's accounting (train.py:63-65 with
  rollout.py:147-149).

Choosing B (``--n_parallel_envs``): large B maximizes collection
throughput.  Round-2 finding (RESULTS.md, "Quality at large batch"):
large-batch runs on the tiny 10x10 board learn a perfectly-generalizing
policy by ~400-600k steps and then over-specialize to the short horizon
(50x50 zero-shot decays 1.00 -> ~0.2 while 10x10 stays ~0.9).  Two robust
recipes fix it: train on 20x20 (``--chip_size=20 --n_parallel_envs=64
--lr_decay --param_ema=0.999`` -> 1.00/1.00/0.99 on 50x50 across seeds),
or stop at the early optimum (``--n_steps=6``).  Default B (0) keeps the
reference's ``n_episodes`` granularity for exact-protocol parity runs.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marl_dmfb_tpu import checkpoint as ckpt
from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs.registry import Env
from marl_dmfb_tpu.rollout import make_rollout, summarize_eval


def model_state_path(args: Args, tag) -> str:
    """Checkpoint dir for a tag: "final"/"3" are prefixed with the current
    run id; a run-prefixed tag like "0_final" addresses that run directly
    (so e.g. run 1 can resume from run 0's checkpoint)."""
    model_dir = os.path.join(
        args.data_dir, args.model_dir.lstrip("./"), args.alg, f"fov{args.fov}"
    )
    name = f"{tag}_state" if "_" in str(tag) else f"{args.ith_run}_{tag}_state"
    return os.path.join(model_dir, name)


def restructure_by_path(template, data, path: str = "<checkpoint>"):
    """Rebuild a restored checkpoint tree onto a live template by KEY PATH.

    Orbax serializes NamedTuples (optax states) as dicts keyed by field
    name and tuples as lists; each template leaf is looked up in ``data``
    by its named path (``GetAttrKey`` -> field name, ``DictKey`` -> key,
    ``SequenceKey`` -> index) and verified for shape and dtype kind.  A
    missing/renamed field or a mismatched leaf raises ``ValueError`` naming
    the exact path — the reference's pickle round-trip is trivially
    name-exact (policy/vdn.py:41-53); ours must be no weaker, and adam's
    ``mu``/``nu`` share shape and dtype so only name matching can catch a
    layout change."""
    from jax.tree_util import (DictKey, GetAttrKey, SequenceKey,
                               tree_flatten_with_path)

    paths_and_leaves, treedef = tree_flatten_with_path(template)

    def key_name(k):
        if isinstance(k, GetAttrKey):
            return k.name
        if isinstance(k, DictKey):
            return k.key
        if isinstance(k, SequenceKey):
            return k.idx
        raise ValueError(
            f"checkpoint restore at {path}: unsupported tree node key {k!r}"
        )

    def fmt(kp):
        return "/".join(str(key_name(k)) for k in kp) or "<root>"

    leaves = []
    for kp, t in paths_and_leaves:
        node = data
        for k in kp:
            name = key_name(k)
            try:
                if isinstance(node, dict) and name not in node:
                    node = node[str(name)]  # int keys may round-trip as str
                else:
                    node = node[name]
            except (KeyError, IndexError, TypeError):
                raise ValueError(
                    f"checkpoint at {path} has no entry for '{fmt(kp)}' "
                    f"(failed at '{name}') — the saved layout does not "
                    "match this trainer's state structure"
                ) from None
        ts = tuple(getattr(t, "shape", ()))
        ls = tuple(getattr(node, "shape", ()))
        if ts != ls:
            raise ValueError(
                f"checkpoint leaf '{fmt(kp)}' shape mismatch at {path}: "
                f"restored {ls} vs expected {ts}"
            )
        td = getattr(t, "dtype", np.float32)
        ld = getattr(node, "dtype", np.float32)
        if jnp.issubdtype(td, jnp.floating) != jnp.issubdtype(
            ld, jnp.floating
        ):
            raise ValueError(
                f"checkpoint leaf '{fmt(kp)}' dtype kind mismatch at "
                f"{path}: restored {ld} vs expected {td}"
            )
        leaves.append(node)
    # Strictness: the checkpoint may not contain leaves the template lacks
    # either — e.g. an opt_state saved with --lr_decay (extra schedule
    # counter) must not silently restore into a constant-lr trainer.
    tmpl_paths = {fmt(kp) for kp, _ in paths_and_leaves}
    data_paths = {fmt(kp) for kp, _ in tree_flatten_with_path(data)[0]}
    if data_paths - tmpl_paths:
        extra = sorted(data_paths - tmpl_paths)
        raise ValueError(
            f"checkpoint structure mismatch at {path}: saved tree has "
            f"entries this trainer's state does not: {extra[:5]} — was it "
            "trained with different flags?"
        )
    return jax.tree.unflatten(treedef, leaves)


def restore_net_config(args: Args, tag) -> Args:
    """Read the net hyperparameters out of a saved checkpoint so a model
    trained under any YAML evaluates correctly.  (The reference always
    loads the 4-droplet YAML at evaluation time, arguments.py:130, which
    breaks loading models trained with other net dims — fixed here since
    checkpoints are self-describing.)"""
    path = model_state_path(args, tag)
    tree = ckpt.restore(path)
    for k, v in tree.get("net_config", {}).items():
        setattr(args, k, int(v) if not isinstance(v, str) else v)
    return args


class Trainer:
    def __init__(self, env: Env, args: Args, mesh=None,
                 eval_only: bool = False):
        """``eval_only`` skips the replay buffer and training env states —
        evaluation entry points must not allocate the YAML's replay
        capacity (a 10k-episode MEDA 80x80-10d buffer alone exceeds the
        chip's HBM)."""
        self.env = env
        self.args = args
        self.mesh = mesh
        self.eval_only = eval_only
        args.update_env_info(env.env_info())

        self.use_state = args.alg == "qmix"
        (self.init_learner, self.learn, self.net,
         self.learn_many, self.loss_fn) = make_learner(args, env, mesh=mesh)

        key = jax.random.PRNGKey(args.seed)
        key, k_learn, k_envs, k_eval, self.key = jax.random.split(key, 5)
        self.learner_state = self.init_learner(k_learn)

        B = args.rollout_batch
        if mesh is not None:
            # the rollout batch must tile the mesh; round up so every
            # device simulates the same number of envs
            n_dev = int(mesh.devices.size)
            if B % n_dev:
                B = ((B + n_dev - 1) // n_dev) * n_dev
                print(f"mesh: rounding rollout batch up to {B} "
                      f"({n_dev} devices)", flush=True)
        self.B = B
        self.env_states = (
            None if eval_only
            else jax.vmap(env.init)(jax.random.split(k_envs, B))
        )
        self.eval_states = jax.vmap(env.init)(
            jax.random.split(k_eval, args.evaluate_task)
        )
        if mesh is not None:
            from marl_dmfb_tpu.parallel.mesh import shard_batch, replicate

            if not eval_only:
                self.env_states = shard_batch(mesh, self.env_states)
            self.eval_states = shard_batch(mesh, self.eval_states)
            self.learner_state = replicate(mesh, self.learner_state)

        self.rollout = make_rollout(
            env, self.net, args.rnn_hidden_dim, with_state=self.use_state,
            mesh_sharded=mesh is not None,
        )

        obs_dtype = env.params.obs_dtype
        if eval_only:
            self.replay = None
        else:
            capacity = args.buffer_size
            if mesh is not None:
                # shard_batch REPLICATES any leaf whose axis-0 size doesn't
                # tile the mesh — for the multi-GB replay that would silently
                # blow the HBM budget, so round capacity up like the batch
                n_dev = int(mesh.devices.size)
                if capacity % n_dev:
                    capacity = ((capacity + n_dev - 1) // n_dev) * n_dev
                    print(f"mesh: rounding replay capacity up to {capacity} "
                          f"({n_dev} devices)", flush=True)
            self.replay = replay_lib.init_replay(
                capacity=capacity,
                episode_limit=args.episode_limit,
                n_agents=args.n_agents,
                obs_dim=args.obs_shape[-1],
                n_actions=args.n_actions,
                obs_dtype=obs_dtype,
                state_dim=args.state_shape if self.use_state else None,
            )
            if mesh is not None:
                # buffer capacity sharded over the mesh (episodes live where
                # they were collected; minibatch gathers ride ICI)
                from marl_dmfb_tpu.parallel.mesh import shard_batch

                self.replay = shard_batch(mesh, self.replay)
        # --local_sampling: each device ring-writes its own rollout shard
        # and samples its minibatch share locally — zero cross-device
        # replay traffic per cycle (replay.make_local_store +
        # qlearn.learn_many's shard_map sampling path)
        self._store = (
            replay_lib.make_local_store(mesh)
            if (mesh is not None and args.local_sampling and not eval_only)
            else replay_lib.store
        )

        self.epsilon = jnp.float32(args.epsilon)
        if args.epsilon_anneal_scale == "step":
            self.anneal_per_step = jnp.float32(
                (args.epsilon - args.min_epsilon) / args.anneal_steps * B
            )
        else:
            self.anneal_per_step = jnp.float32(0.0)
        self.updates_per_rollout = max(
            1, round(args.train_time * B / args.n_episodes)
        )

        # Optional EMA of the network params for evaluation/saving
        # (--param_ema): large-B runs oscillate late in training; the
        # moving average is a deterministic smoother (no checkpoint
        # selection).  Updated once per cycle with the per-update decay
        # compounded over the cycle's fused updates.
        self.ema_params = None
        if args.param_ema:
            self.ema_params = self.learner_state.params
            cycle_decay = float(args.param_ema) ** self.updates_per_rollout
            self._ema_step = jax.jit(
                lambda ema, p: jax.tree.map(
                    lambda e, q: cycle_decay * e + (1.0 - cycle_decay) * q,
                    ema, p,
                )
            )

        # metric curves (train.py:21-25)
        self.episode_rewards = []
        self.episode_steps = []
        self.episode_constraints = []
        self.success_rate = []
        self.time_cost = []

        self.save_path = os.path.join(
            args.data_dir, args.result_dir.lstrip("./"),
            args.alg, f"fov{args.fov}",
            f"{args.width}by{args.length}-{args.drop_num}d{args.block_num}b",
        )
        self.model_dir = os.path.join(
            args.data_dir, args.model_dir.lstrip("./"),
            args.alg, f"fov{args.fov}",
        )
        os.makedirs(self.save_path, exist_ok=True)
        os.makedirs(self.model_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def evaluate(self, n_tasks: Optional[int] = None) -> dict:
        """Greedy evaluation over a fresh batch of random tasks
        (reference Evaluator.evaluate, rollout.py:69-85)."""
        params = (self.ema_params if self.ema_params is not None
                  else self.learner_state.params)
        result = self.rollout(
            params["agent"],
            self.eval_states,
            self._next_key(),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            greedy=True,
        )
        self.eval_states = result.env_states
        return summarize_eval(result)

    def save_model(self, tag) -> str:
        path = os.path.join(
            self.model_dir, f"{self.args.ith_run}_{tag}_state"
        )
        tree = {
            "learner": self.learner_state._asdict(),
            # deploy/eval params: the EMA when --param_ema is on (what
            # evaluate.py restores via params_only), raw params otherwise
            **({"ema": self.ema_params} if self.ema_params is not None
               else {}),
            "epsilon": self.epsilon,
            "key": self.key,
            "net_config": {
                "net": self.args.net,
                "rnn_hidden_dim": self.args.rnn_hidden_dim,
                "hyper_hidden_dim": self.args.hyper_hidden_dim,
                "qmix_hidden_dim": self.args.qmix_hidden_dim,
            },
        }
        if getattr(self.args, "ckpt_replay", False) and not self.eval_only:
            # --ckpt_replay: BIT-EXACT resume.  The default checkpoint
            # restores learner/epsilon/PRNG but restarts the replay ring
            # empty and re-inits the training env states — statistically
            # fine, but resumed trajectories diverge from an uninterrupted
            # run, and under --b_degrade the accumulated electrode wear in
            # the training envs would be lost.  This saves the replay
            # (data+cursor+size) and the training env states too; off by
            # default because the replay is the dominant HBM tenant (a
            # MEDA 10k-episode buffer is ~5GB on disk).
            self.replay = jax.block_until_ready(self.replay)
            tree["replay"] = self.replay._asdict()
            tree["env_states"] = self.env_states._asdict()
        ckpt.save(path, tree)
        return path

    def load_model(self, tag, params_only: bool = False):
        """Restore a checkpoint. ``params_only=True`` restores just the
        network/target params (what evaluation needs) and skips optimizer
        state — the opt_state PyTree structure depends on training-time
        flags (e.g. ``--lr_decay`` adds a schedule counter), which an
        eval-only entry point does not and should not know about."""
        path = model_state_path(self.args, tag)
        tree = ckpt.restore(path)
        from marl_dmfb_tpu.algos.qlearn import LearnerState

        def restructure(template, data):
            # Orbax restores NamedTuples (optax states) as NAME-KEYED dicts
            # and tuples as lists; rebuild onto the live structure by KEY
            # PATH, not leaf order — adam's mu/nu have identical shapes and
            # dtypes, so an order-based zip would silently permute
            # first/second moments if a future optax/orbax layout changed
            # their flatten order.  Every leaf is looked up by its named
            # path in the restored tree and verified (shape + dtype kind);
            # a missing or renamed field fails loudly BY NAME.
            return restructure_by_path(template, data, path)

        def restructure_params(template, data):
            # Network-params restore: the "agent" subtree must match
            # exactly, but a QMIX "mixer" is state-conditioned on the
            # TRAINING board's W*L and greedy evaluation never calls it —
            # so on a params_only cross-board eval (e.g. a 20x20-trained
            # QMIX evaluated zero-shot on 50x50, the reference
            # evaluate.py generalization workload) the mismatched mixer
            # is dropped and the eval board's fresh mixer kept (unused).
            if not (params_only and "mixer" in template and "mixer" in data):
                return restructure(template, data)
            out = {"agent": restructure(template["agent"], data["agent"])}
            try:
                out["mixer"] = restructure(template["mixer"], data["mixer"])
            except ValueError:
                print("load_model: QMIX mixer shape is tied to the training "
                      "board; keeping a fresh (unused-in-eval) mixer for "
                      "this board size", flush=True)
                out["mixer"] = template["mixer"]
            return out

        fresh = self.learner_state
        if params_only and "ema" in tree:
            # evaluation restores the EMA (deploy) params when present
            ema = restructure_params(fresh.params, tree["ema"])
            self.learner_state = fresh._replace(
                params=ema, target_params=ema
            )
            # evaluate() must use exactly the restored weights, not a live
            # EMA from this process — drop any in-memory average
            self.ema_params = None
            self.epsilon = jnp.asarray(tree["epsilon"])
            return
        self.learner_state = LearnerState(
            params=restructure_params(
                fresh.params, tree["learner"]["params"]
            ),
            target_params=restructure_params(
                fresh.target_params, tree["learner"]["target_params"]
            ),
            opt_state=(
                fresh.opt_state if params_only
                else restructure(fresh.opt_state, tree["learner"]["opt_state"])
            ),
            train_step=jnp.asarray(tree["learner"]["train_step"]),
        )
        if not params_only and "replay" in tree and self.replay is not None:
            # --ckpt_replay checkpoints: restore the replay ring and the
            # training env states for bit-exact resume (see save_model).
            from marl_dmfb_tpu.replay import ReplayState

            rep = restructure_by_path(self.replay._asdict(), tree["replay"],
                                      path)
            self.replay = ReplayState(**jax.tree.map(jnp.asarray, rep))
            env = restructure_by_path(self.env_states._asdict(),
                                      tree["env_states"], path)
            self.env_states = type(self.env_states)(
                **jax.tree.map(jnp.asarray, env)
            )
            if self.mesh is not None:
                from marl_dmfb_tpu.parallel.mesh import shard_batch

                self.replay = shard_batch(self.mesh, self.replay)
                self.env_states = shard_batch(self.mesh, self.env_states)
        if params_only:
            # see above: a checkpoint without an 'ema' entry evaluates with
            # its raw params, never this process's stale average
            self.ema_params = None
        elif self.ema_params is not None:
            # resuming training with --param_ema: restore the saved average,
            # or anchor to the restored weights when the checkpoint predates
            # the flag (never to this process's random init)
            self.ema_params = (
                restructure(self.ema_params, tree["ema"])
                if "ema" in tree else self.learner_state.params
            )
        self.epsilon = jnp.asarray(tree["epsilon"])
        # the training PRNG stream resumes where it stopped (without this
        # a resumed run replays the fresh-init key sequence — saved since
        # round 1 but only restored since round 4).  Evaluation
        # (params_only) keeps its own fresh seed-derived stream.
        if "key" in tree and not params_only:
            self.key = jnp.asarray(tree["key"])

    def train_cycle(self):
        """One collect+learn cycle; returns env steps consumed."""
        if self.eval_only:
            raise RuntimeError("Trainer was built with eval_only=True")
        result = self.rollout(
            self.learner_state.params["agent"],
            self.env_states,
            self._next_key(),
            self.epsilon,
            self.anneal_per_step,
            jnp.float32(self.args.min_epsilon),
            greedy=False,
        )
        self.env_states = result.env_states
        if self.args.epsilon_anneal_scale == "episode":
            # reference decrements once per GENERATED episode
            # (rollout.py:126-127 with train.py:59-66); a rollout collects B
            # episodes, so decrement B schedule-steps, clamped.
            eps = float(self.epsilon)
            dec = self.B * (
                self.args.epsilon - self.args.min_epsilon
            ) / self.args.anneal_steps
            self.epsilon = jnp.float32(
                max(self.args.min_epsilon, eps - dec)
            )
        else:
            self.epsilon = result.epsilon
        self.replay = self._store(self.replay, result.episodes)
        self.learner_state, self._last_loss = self.learn_many(
            self.learner_state, self.replay.data, self.replay.size,
            self._next_key(), self.updates_per_rollout,
        )
        if self.ema_params is not None:
            self.ema_params = self._ema_step(
                self.ema_params, self.learner_state.params
            )
        return int(jnp.sum(result.steps))

    def run(self, online_evaluate: bool = True,
            profile_dir: Optional[str] = None):
        """Main loop (reference train.py:32-93).

        ``profile_dir``: capture a jax.profiler trace of one representative
        collect+learn cycle (the reference only ever logged wall-clock
        spans, SURVEY §5)."""
        args = self.args
        time_steps, evaluate_steps = 0, -1
        profiled = False
        start = time.time()
        # Heartbeat for long CPU-mesh runs (cycles can take tens of seconds
        # there): MARL_DMFB_PROGRESS=N prints a one-line progress mark every
        # N cycles.  Off by default — the reference only prints per eval.
        progress_every = int(os.environ.get("MARL_DMFB_PROGRESS", "0") or 0)
        n_cycles = 0
        while time_steps < args.total_env_steps:
            if time_steps // args.evaluate_cycle > evaluate_steps:
                evaluate_steps += 1
                self.time_cost.append(time.time() - start)
                self.save_model(evaluate_steps)
                if online_evaluate:
                    m = self.evaluate()
                    self.episode_rewards.append(m["reward"])
                    self.episode_steps.append(m["steps"])
                    self.episode_constraints.append(m["constraints"])
                    self.success_rate.append(m["success_rate"])
                    self.plot()
                    self.save_curves()
                print(
                    f"Run {args.ith_run}, time_steps {time_steps}, "
                    f"evaluate {evaluate_steps}, "
                    f"elapsed {self.time_cost[-1]:.1f}s"
                    + (
                        f", success {self.success_rate[-1]:.3f}"
                        if online_evaluate and self.success_rate
                        else ""
                    ),
                    flush=True,
                )
            if profile_dir is not None and not profiled and time_steps > 0:
                with jax.profiler.trace(profile_dir):
                    time_steps += self.train_cycle()
                profiled = True
            else:
                time_steps += self.train_cycle()
            n_cycles += 1
            if progress_every and n_cycles % progress_every == 0:
                print(f"  cycle {n_cycles}: time_steps {time_steps}, "
                      f"epsilon {float(self.epsilon):.3f}, "
                      f"elapsed {time.time() - start:.0f}s", flush=True)
        self.save_model("final")
        self.time_cost.append(time.time() - start)
        if online_evaluate:
            m = self.evaluate()
            self.episode_rewards.append(m["reward"])
            self.episode_steps.append(m["steps"])
            self.episode_constraints.append(m["constraints"])
            self.success_rate.append(m["success_rate"])
            self.plot()
            self.save_curves()
        else:
            self.evaluate_total()
        return {
            "rewards": self.episode_rewards,
            "steps": self.episode_steps,
            "constraints": self.episode_constraints,
            "success_rate": self.success_rate,
            "runtime": self.time_cost,
        }

    def evaluate_total(self):
        """Offline sweep: reload every saved checkpoint and evaluate it
        (reference train.py:96-118; the `--online_eval=False` path)."""
        args = self.args
        self.episode_rewards.clear()
        self.episode_steps.clear()
        self.episode_constraints.clear()
        self.success_rate.clear()
        tags = list(range(args.total_env_steps // args.evaluate_cycle))
        tags.append("final")
        for tag in tags:
            try:
                self.load_model(tag, params_only=True)
            except FileNotFoundError:
                continue
            m = self.evaluate()
            self.episode_rewards.append(m["reward"])
            self.episode_steps.append(m["steps"])
            self.episode_constraints.append(m["constraints"])
            self.success_rate.append(m["success_rate"])
            print(f"checkpoint {tag}: success {m['success_rate']:.3f}",
                  flush=True)
        self.plot()
        self.save_curves()

    # ------------------------------------------------------------------
    def plot(self):
        """5-panel training curves PNG (train.py:120-143)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        names = ["Rewards", "$T_{latest}$", "Constraints", "success rate",
                 "run time"]
        data = [self.episode_rewards, self.episode_steps,
                self.episode_constraints, self.success_rate, self.time_cost]
        fig, axes = plt.subplots(5, 1, figsize=(10, 10))
        for ax, series, name in zip(axes, data, names):
            ax.plot(series, linewidth=2)
            ax.set_xlabel(f"evaluate times, eq {self.args.evaluate_cycle} steps")
            ax.set_ylabel(name)
        fig.tight_layout()
        fig.savefig(
            os.path.join(self.save_path, f"plt_{self.args.ith_run}.png"),
            format="png", dpi=150,
        )
        plt.close(fig)

    def save_curves(self):
        """npy curve dumps with reference-compatible filenames
        (train.py:145-158)."""
        a = self.args
        prefix = (
            f"{a.alg}_env({a.width},{a.length},{a.drop_num},"
            f"{a.block_num},{a.fov},{a.stall})"
        )
        num = a.ith_run
        for name, series in [
            (f"{prefix}Rewards_{num}", self.episode_rewards),
            (f"{prefix}steps_{num}", self.episode_steps),
            (f"{prefix}constraints_{num}", self.episode_constraints),
            (f"{prefix}success_rate_{num}", self.success_rate),
            (f"{prefix}runtime_{num}", self.time_cost),
        ]:
            np.save(os.path.join(self.save_path, name), np.asarray(series))
