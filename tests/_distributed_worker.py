"""Worker process for the 2-process ``jax.distributed`` CPU test.

SURVEY §4:254-256 prescribes multi-process CPU testing as the standard
substitute for multi-host TPU: each process contributes its local virtual
devices to one global mesh and the full training step (rollout -> replay
store -> sample -> learn) runs SPMD with XLA/Gloo collectives across the
process boundary.

Launched by tests/test_parallel.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set — the same env contract train.py's
multi-host gate uses.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from marl_dmfb_tpu import replay as replay_lib
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.config import Args
    from marl_dmfb_tpu.envs import make_env
    from marl_dmfb_tpu.parallel.distributed import init_distributed
    from marl_dmfb_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from marl_dmfb_tpu.rollout import make_rollout

    assert init_distributed(), "expected multi-process initialization"
    assert jax.process_count() == 2, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4, n_global  # 2 processes x 2 virtual devices

    B = 8
    args = Args(name="dmfb", drop_num=2, fov=5, width=5, length=5,
                batch_size=8, buffer_size=16, n_parallel_envs=B)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args.update_env_info(env.env_info())

    init, learn, net, learn_many, _ = make_learner(args, env)
    mesh = make_mesh()  # global mesh spanning both processes
    lstate = replicate(mesh, init(jax.random.PRNGKey(0)))
    # every process computes the same global host array; shard_batch
    # device_puts it onto the cross-process mesh
    states = shard_batch(mesh, jax.vmap(env.init)(
        jax.random.split(jax.random.PRNGKey(1), B)
    ))

    rollout = make_rollout(env, net, args.rnn_hidden_dim)
    res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                  jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                  greedy=False)

    rb = shard_batch(mesh, replay_lib.init_replay(
        capacity=args.buffer_size, episode_limit=args.episode_limit,
        n_agents=2, obs_dim=args.obs_shape[-1], n_actions=args.n_actions,
    ))
    rb = replay_lib.store(rb, res.episodes)
    lstate, loss = learn_many(lstate, rb.data, rb.size,
                              jax.random.PRNGKey(3), 2)
    leaf = jax.tree.leaves(lstate.params)[0]
    assert leaf.sharding.is_fully_replicated

    # Full-state Orbax checkpoint under the 2-process ring (VERDICT r3
    # #6): orbax multi-process save is COLLECTIVE — every process calls
    # save() on the same path (process 0 owns the filesystem ops, the
    # others sync via the jax.distributed coordination service the ring
    # already established).  Restore is per-process host-side reads; the
    # round-trip goes through the production restructure_by_path to prove
    # a sharded trainer's resume works, not just raw orbax.
    ckpt_dir = os.environ.get("MARL_DMFB_CKPT_DIR")
    if ckpt_dir:
        import numpy as np

        from marl_dmfb_tpu import checkpoint as ckpt_lib
        from marl_dmfb_tpu.trainer import restructure_by_path

        path = os.path.join(ckpt_dir, "dist_state")
        ckpt_lib.save(path, {
            "learner": lstate._asdict(),
            "epsilon": jnp.float32(0.5),
        })
        tree = ckpt_lib.restore(path)
        restored = restructure_by_path(lstate._asdict(), tree["learner"],
                                       path)
        for a, b in zip(jax.tree.leaves(lstate._asdict()),
                        jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(tree["epsilon"]) == 0.5
        print(f"CKPT_OK process={jax.process_index()}", flush=True)

    print(f"DIST_OK process={jax.process_index()} loss={float(loss):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
