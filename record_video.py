"""Record a video of a trained policy routing droplets (the reference's
``--show``/``--show_save`` workload, with procedural sprites since the
reference's sprite assets are missing from its repo).

Usage:
    python record_video.py dmfb --drop_num=4 --fov=9 \
        --load_model_name=0_final --evaluate_task=3 --data_dir=...
Writes video/<config>-<time>.mp4 under data_dir.
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import os

import jax
import jax.numpy as jnp
import numpy as np

from marl_dmfb_tpu.config import get_evaluate_args, make_env_from_args
from marl_dmfb_tpu.models.networks import build_agent_net
from marl_dmfb_tpu.render import Renderer
from marl_dmfb_tpu.trainer import model_state_path, restore_net_config
from marl_dmfb_tpu import checkpoint as ckpt


def main(argv=None):
    args = get_evaluate_args(argv)
    tag = (args.load_model_name or "final")
    if tag.startswith(f"{args.ith_run}_"):
        tag = tag[len(f"{args.ith_run}_"):]
    tag = tag.rstrip("_")
    restore_net_config(args, tag)
    env = make_env_from_args(args)
    args.update_env_info(env.env_info())
    net = build_agent_net(args)
    tree = ckpt.restore(model_state_path(args, tag))
    # prefer the EMA (deploy) params when the run trained with --param_ema
    theta = tree.get("ema", tree["learner"]["params"])["agent"]

    N, A, H = args.n_agents, args.n_actions, args.rnn_hidden_dim

    @jax.jit
    def act(obs, last_oh, h):
        x = jnp.concatenate([obs.astype(jnp.float32), last_oh], -1)
        q, h2 = net.apply({"params": theta}, x, h)
        return jnp.argmax(q, -1).astype(jnp.int32), h2

    step = jax.jit(env.step)
    reset = jax.jit(env.reset, static_argnames=("new",))

    video_dir = os.path.join(args.data_dir, "video")
    path = os.path.join(
        video_dir,
        f"{args.width}by{args.length}-{args.drop_num}d{args.block_num}b.mp4",
    )
    renderer = Renderer(env, save_path=path, show=args.show)
    state = env.init(jax.random.PRNGKey(args.seed))
    episodes = max(1, min(int(args.evaluate_task), 10))
    for ep in range(episodes):
        state = reset(state)
        h = jnp.zeros((N, H))
        last = jnp.zeros((N, A))
        renderer.draw(state)
        for t in range(env.episode_limit):
            obs = env.observe(state)
            a, h = act(obs, last, h)
            last = jax.nn.one_hot(a, A)
            state, out = step(state, a)
            renderer.draw(state)
            if bool(out.terminated):
                break
        print(f"episode {ep}: steps={t+1} success={int(out.success)}",
              flush=True)
    renderer.close()
    print("video saved to", getattr(renderer, "video_path", path))


if __name__ == "__main__":
    main()
