"""Evaluate a trained model on fresh random tasks (reference evaluate.py).

Usage:
    python evaluate.py dmfb --drop_num=4 --chip_size=20 --evaluate_task=100 \
        --load_model_name=0_final
The generalization workload: a model trained on 10x10 runs on larger chips
because observations are FOV-local (reference evaluate.py:7-29).
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import os
import time

from marl_dmfb_tpu.config import get_evaluate_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer, restore_net_config


def evaluate_rendered(trainer: Trainer, args) -> dict:
    """Rendered evaluation (reference evaluate.py:13-16: with ``--show`` /
    ``--show_save`` every evaluation episode is rendered via env.render
    inside Evaluator.one_step, rollout.py:19-39 + dmfb.py:642-720).

    Host-side episode loop with the procedural Renderer; the metrics use
    the same accounting as the fused path (failed episodes count as
    ``episode_limit`` steps, rollout.py:147-149)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from marl_dmfb_tpu.render import Renderer

    env, net = trainer.env, trainer.net
    theta = trainer.learner_state.params["agent"]
    N, A, H = args.n_agents, args.n_actions, args.rnn_hidden_dim

    @jax.jit
    def act(obs, last_oh, h):
        x = jnp.concatenate([obs.astype(jnp.float32), last_oh], -1)
        q, h2 = net.apply({"params": theta}, x, h)
        return jnp.argmax(q, -1).astype(jnp.int32), h2

    step = jax.jit(env.step)
    reset = jax.jit(env.reset, static_argnames=("new",))
    observe = jax.jit(env.observe)  # un-jitted it eagerly dispatches the
    # whole FOV-obs graph op-by-op (~40ms/op over the tunnel)
    save_path = None
    if args.show_save:
        save_path = os.path.join(
            args.data_dir, "video",
            f"eval-{args.width}by{args.length}-"
            f"{args.drop_num}d{args.block_num}b.mp4",
        )
    renderer = Renderer(env, show=args.show, save_path=save_path)
    state = env.init(jax.random.PRNGKey(args.seed))
    T = env.episode_limit
    rewards, steps, cons, succ = [], [], [], []
    for _ in range(int(args.evaluate_task)):
        state = reset(state)
        h = jnp.zeros((N, H))
        last = jnp.zeros((N, A))
        renderer.draw(state)
        ep_r, ep_c, ok, t_used = 0.0, 0, 0, T
        for t in range(T):
            obs = observe(state)
            a, h = act(obs, last, h)
            last = jax.nn.one_hot(a, A)
            state, out = step(state, a)
            renderer.draw(state)
            ep_r += float(out.team_reward)
            ep_c += int(out.constraints)
            if bool(out.terminated):
                ok = int(out.success)
                if ok:
                    t_used = t + 1
                break
        rewards.append(ep_r)
        steps.append(t_used)
        cons.append(ep_c)
        succ.append(ok)
    renderer.close()
    if save_path is not None:
        print("video saved to", getattr(renderer, "video_path", save_path))
    return {
        "reward": float(np.mean(rewards)),
        "steps": float(np.mean(steps)),
        "constraints": float(np.mean(cons)),
        "success_rate": float(np.mean(succ)),
    }


def evaluate_one(args) -> dict:
    """Evaluate one (board, model) configuration; returns the metric dict."""
    env = make_env_from_args(args)
    tag = None
    if args.load_model:
        tag = args.load_model_name or "final"
        # accept both "0_final" (run-prefixed) and "final"
        if tag.startswith(f"{args.ith_run}_"):
            tag = tag[len(f"{args.ith_run}_"):]
        tag = tag.rstrip("_")
        restore_net_config(args, tag)
    trainer = Trainer(env, args, eval_only=True)
    if tag is not None:
        trainer.load_model(tag, params_only=True)
    if args.show or args.show_save:
        return evaluate_rendered(trainer, args)
    return trainer.evaluate()


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    # --boards=10,20,50: the zero-shot generalization sweep as ONE command
    # (FOV-local observations make one checkpoint valid on every board
    # size — the reference's generalization workload, evaluate.py:7-29,
    # needed one manual invocation per size).
    boards = None
    for a in list(argv):
        if a.startswith("--boards"):
            argv.remove(a)
            boards = [int(b) for b in
                      (a.split("=", 1)[1] if "=" in a
                       else "").split(",") if b]
    args = get_evaluate_args(argv)
    start = time.time()
    if boards:
        rows = []
        for size in boards:
            a = get_evaluate_args(argv)
            a.width = a.length = size
            a.apply_env_defaults()
            m = evaluate_one(a)
            rows.append((size, m))
            print(f"{size}x{size}: success {m['success_rate']:.2f}, "
                  f"steps {m['steps']:.1f}, reward {m['reward']:.2f}",
                  flush=True)
        print("time:", time.time() - start)
        print(f"{'board':>8} {'success':>8} {'steps':>7} {'reward':>8}")
        for size, m in rows:
            print(f"{size:>5}x{size:<3} {m['success_rate']:>8.2f} "
                  f"{m['steps']:>7.1f} {m['reward']:>8.2f}")
        return
    m = evaluate_one(args)
    print("time:", time.time() - start)
    print("The average total_rewards of {} is  {}".format(args.alg, m["reward"]))
    print("The average total_steps is: {}".format(m["steps"]))
    print("The successful rate is: {}".format(m["success_rate"]))


if __name__ == "__main__":
    main()
