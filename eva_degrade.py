"""Electrode-degradation sweep (reference evaDegre.py).

Protocol parity (evaDegre.py:29-56): 5 independent fully-degradable chips
(b_degrade=True, per_degrade=1.0); per epoch, snapshot the health map then
evaluate ``evaluate_task`` episodes — health decays ACROSS episodes because
every reset applies updateHealth (dmfb.py:594,174-183).

TPU re-design: the 5 chips run in parallel (a batch axis), while episodes
within a chip stay sequential so wear accumulates exactly like the
reference.  Saves rewards/steps/success (5, epochs) and health
(5, epochs, W, L) npys to DegreData/.

Usage:
    python eva_degrade.py dmfb --evaluate_task=20 --fov=9 --drop_num=4 \
        --load_model_name=0_final
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import os

import jax
import jax.numpy as jnp
import numpy as np

from marl_dmfb_tpu.config import get_evaluate_args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.trainer import Trainer, restore_net_config

N_RUNS = 5  # evaDegre.py:36


def degre_dir(args) -> str:
    """Output directory for the sweep npys (reference evaDegre.py:47-49's
    ``<W>by<L>-<n>d<b>b`` label; non-square chips like MEDA 30x60 keep both
    dimensions)."""
    label = f"{args.width}by{args.length}-{args.drop_num}d{args.block_num}b"
    if getattr(args, "noise_eps", 0.0):
        # control sweeps must not overwrite the protocol-parity artifacts
        label += f"-eps{args.noise_eps:g}"
    return os.path.join(args.data_dir, "DegreData", label)


def main(argv=None):
    args = get_evaluate_args(argv)
    args.b_degrade = True
    args.per_degrade = 1.0
    env = make_env(
        "dmfb" if args.name == "dmfb" else "meda",
        version=args.version,
        width=args.width, length=args.length, n_droplets=args.drop_num,
        fov=args.fov, stall=args.stall, b_degrade=True, per_degrade=1.0,
        **({"n_blocks": args.block_num} if args.name == "dmfb" else {}),
    )
    args.evaluate_task = int(args.evaluate_task)
    tag = None
    if args.load_model:
        tag = args.load_model_name or "final"
        if tag.startswith(f"{args.ith_run}_"):
            tag = tag[len(f"{args.ith_run}_"):]
        tag = tag.rstrip("_")
        restore_net_config(args, tag)
    trainer = Trainer(env, args, eval_only=True)
    if tag is not None:
        trainer.load_model(tag, params_only=True)

    # 5 chips in parallel; wear persists in these states across all episodes
    states = jax.vmap(env.init)(
        jax.random.split(jax.random.PRNGKey(args.seed), N_RUNS)
    )
    epochs = int(args.evaluate_epoch)
    W, L = args.width, args.length
    rewards = np.zeros((N_RUNS, epochs))
    steps = np.zeros((N_RUNS, epochs))
    success = np.zeros((N_RUNS, epochs))
    health = np.zeros((N_RUNS, epochs, W, L))

    usage = np.zeros((N_RUNS, epochs, W, L))
    # --noise_eps > 0: a control sweep with a deliberately weakened policy
    # (epsilon-greedy at a fixed rate) — more steps per episode means more
    # electrode actuations, demonstrating the wear->failure feedback loop
    # with a policy of reference-era efficiency (see RESULTS.md,
    # "Degradation sweeps").
    noise = jnp.float32(args.noise_eps)
    greedy = args.noise_eps == 0.0

    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(epochs):
        health[:, epoch] = np.array(states.health)
        usage[:, epoch] = np.array(states.usage)
        ep_r = np.zeros(N_RUNS)
        ep_s = np.zeros(N_RUNS)
        ep_ok = np.zeros(N_RUNS)
        for task in range(args.evaluate_task):
            key, sub = jax.random.split(key)
            res = trainer.rollout(
                trainer.learner_state.params["agent"], states, sub,
                noise, jnp.float32(0.0), noise,
                greedy=greedy,
            )
            states = res.env_states
            ep_r += np.array(res.reward)
            ep_s += np.array(res.steps)
            ep_ok += np.array(res.success)
        rewards[:, epoch] = ep_r / args.evaluate_task
        steps[:, epoch] = ep_s / args.evaluate_task
        success[:, epoch] = ep_ok / args.evaluate_task
        print(f"epoch {epoch}: success {success[:, epoch].mean():.3f} "
              f"steps {steps[:, epoch].mean():.1f}", flush=True)

    path = degre_dir(args)
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "rewards.npy"), rewards)
    np.save(os.path.join(path, "steps.npy"), steps)
    np.save(os.path.join(path, "success.npy"), success)
    np.save(os.path.join(path, "health.npy"), health)
    np.save(os.path.join(path, "usage.npy"), usage)
    print("saved to", path)


if __name__ == "__main__":
    main()
