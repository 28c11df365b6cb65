"""1-vs-2-process `jax.distributed` training-step throughput (CPU substitute).

Real multi-host TPU hardware is not reachable from this environment, so the
multi-host scaling claim is measured the way SURVEY §4 prescribes testing
it: the SAME total work (global batch, mesh size, update count) run as

  * 1 process x 4 virtual CPU devices (all collectives in-process), vs
  * 2 processes x 2 virtual CPU devices each (grad psums and replay
    scatter/gathers cross the process boundary over Gloo — the DCN
    stand-in).

The ratio isolates the process-boundary collective cost; on real pods the
same program crosses ICI/DCN with XLA inserting identical collectives.

Prints one JSON line per variant plus an efficiency row:
    {"metric": "multiproc_efficiency", "value": t1/t2, ...}

Usage:  python bench_multiproc.py            (orchestrates both variants)
        python bench_multiproc.py --worker   (internal)
"""

import json
import os
import re
import socket
import subprocess
import sys

CYCLES = 3          # timed cycles per variant (after 1 warmup/compile cycle)
TOTAL_B = 32        # global rollout batch (envs)


def worker():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    import jax.numpy as jnp

    from marl_dmfb_tpu import replay as replay_lib
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.config import Args
    from marl_dmfb_tpu.envs import make_env
    from marl_dmfb_tpu.parallel.distributed import init_distributed
    from marl_dmfb_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if os.environ.get("JAX_NUM_PROCESSES"):
        init_distributed()
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    assert n_dev == 4, f"expected 4 global devices, got {n_dev}"
    local = os.environ.get("MARL_DMFB_BENCH_LOCAL") == "1"

    B = TOTAL_B
    args = Args(name="dmfb", drop_num=2, fov=9, width=10, length=10,
                n_parallel_envs=B, local_sampling=local)
    args.apply_env_defaults()
    args.load_yaml()
    env = make_env("dmfb", width=10, length=10, n_droplets=2, fov=9)
    args.update_env_info(env.env_info())
    if local and args.batch_size % n_dev:
        args.batch_size = (args.batch_size // n_dev) * n_dev
    init, learn, net, learn_many, _ = make_learner(args, env, mesh=mesh)
    from marl_dmfb_tpu.rollout import make_rollout

    rollout = make_rollout(env, net, args.rnn_hidden_dim, mesh_sharded=True)
    lstate = replicate(mesh, init(jax.random.PRNGKey(0)))
    states = shard_batch(mesh, jax.vmap(env.init)(
        jax.random.split(jax.random.PRNGKey(1), B)
    ))
    rb = shard_batch(mesh, replay_lib.init_replay(
        capacity=args.buffer_size, episode_limit=args.episode_limit,
        n_agents=2, obs_dim=args.obs_shape[-1], n_actions=args.n_actions,
    ))
    store = replay_lib.make_local_store(mesh) if local else replay_lib.store
    updates = max(1, round(args.train_time * B / args.n_episodes))

    def cycle(lstate, states, rb, key):
        k1, k2 = jax.random.split(key)
        res = rollout(lstate.params["agent"], states, k1,
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        rb = store(rb, res.episodes)
        lstate, loss = learn_many(lstate, rb.data, rb.size, k2, updates)
        return lstate, res.env_states, rb, loss

    # warmup/compile
    lstate, states, rb, loss = cycle(lstate, states, rb, jax.random.PRNGKey(2))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(CYCLES):
        lstate, states, rb, loss = cycle(
            lstate, states, rb, jax.random.PRNGKey(3 + i)
        )
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / CYCLES
    print(f"WORKER_OK process={jax.process_index()} cycle_s={dt:.3f} "
          f"updates={updates}", flush=True)


def run_variant(n_procs: int, local: bool = False) -> float:
    """Launch n_procs workers; return mean timed cycle seconds."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    dev_per_proc = 4 // n_procs
    procs = []
    for pid in range(n_procs):
        env = dict(
            os.environ,
            XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per_proc}",
            JAX_PLATFORMS="cpu",
            MARL_DMFB_BENCH_LOCAL="1" if local else "0",
        )
        if n_procs > 1:
            env.update(
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES=str(n_procs),
                JAX_PROCESS_ID=str(pid),
            )
        else:
            for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                      "JAX_PROCESS_ID"):
                env.pop(k, None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    times = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"WORKER_OK process=\d cycle_s=([\d.]+)", out)
        assert m, out[-3000:]
        times.append(float(m.group(1)))
    return max(times)  # slowest process gates the SPMD step


def bytes_per_update():
    """Analytic collective-bytes accounting per gradient update (mesh 4):
    what crosses the process boundary (DCN stand-in here, ICI/DCN on
    pods) under global vs local sampling.

    * grads: every update all-reduces the full parameter set (psum) —
      param_count x 4B, both sampling modes.
    * replay gather (GLOBAL sampling only): the uniform episode gather
      reads rows from whichever device's capacity shard owns them; on
      average (n-1)/n of the minibatch's episode bytes move cross-device,
      EVERY update.  Local sampling moves zero replay bytes.
    """
    import numpy as np

    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.config import Args
    from marl_dmfb_tpu.envs import make_env

    rows = []
    for name, kw, label in [
        ("dmfb", dict(width=10, length=10, n_droplets=2, fov=9),
         "dmfb 10x10-2d fov9 (this bench)"),
        ("meda", dict(width=30, length=60, n_droplets=4, fov=19),
         "meda 30x60-4d fov19"),
    ]:
        args = Args(name=name, drop_num=kw["n_droplets"], fov=kw["fov"],
                    width=kw["width"], length=kw["length"])
        args.apply_env_defaults()
        args.load_yaml()
        env = make_env(name, **kw)
        args.update_env_info(env.env_info())
        init, *_ = make_learner(args, env)
        import jax

        params = init(jax.random.PRNGKey(0)).params
        grad_bytes = sum(int(np.prod(l.shape)) * 4
                         for l in jax.tree.leaves(params))
        T, N, obs = args.episode_limit, args.n_agents, args.obs_shape[-1]
        ep_bytes = ((T + 1) * N * obs            # o_ext int8
                    + T * N                       # u int8
                    + T * 4 + T + T)              # r f32, padded, terminated
        gather = args.batch_size * ep_bytes * 3 // 4   # (n-1)/n, n=4
        rows.append({
            "config": label,
            "grad_psum_bytes": grad_bytes,
            "replay_gather_bytes_global": gather,
            "replay_gather_bytes_local": 0,
            "gather_over_grads": round(gather / grad_bytes, 2),
            "batch_size": args.batch_size,
            "episode_bytes": ep_bytes,
        })
    return rows


def main():
    if "--worker" in sys.argv:
        worker()
        return
    t1 = run_variant(1)
    print(json.dumps({"metric": "train_cycle_s_1proc_4dev", "value": round(t1, 3),
                      "unit": f"s/cycle (B={TOTAL_B}, 10x10-2d)",
                      "vs_baseline": None}))
    t2 = run_variant(2)
    print(json.dumps({"metric": "train_cycle_s_2proc_2dev", "value": round(t2, 3),
                      "unit": f"s/cycle (B={TOTAL_B}, 10x10-2d)",
                      "vs_baseline": None}))
    print(json.dumps({
        "metric": "multiproc_efficiency",
        "value": round(t1 / t2, 3),
        "unit": "1-proc cycle time / 2-proc cycle time (1.0 = no "
                "process-boundary cost; same total batch, mesh 4)",
        "vs_baseline": None,
    }))
    t2l = run_variant(2, local=True)
    print(json.dumps({
        "metric": "train_cycle_s_2proc_2dev_local_sampling",
        "value": round(t2l, 3),
        "unit": f"s/cycle (B={TOTAL_B}, 10x10-2d, --local_sampling: "
                "replay store+sample fully device-local, zero replay "
                "bytes across the process boundary)",
        "vs_baseline": round(t2 / t2l, 3),
    }))
    t4 = run_variant(4)
    print(json.dumps({
        "metric": "train_cycle_s_4proc_1dev",
        "value": round(t4, 3),
        "unit": f"s/cycle (B={TOTAL_B}, 10x10-2d; every collective "
                "crosses a process boundary)",
        "vs_baseline": round(t1 / t4, 3),
    }))
    for r in bytes_per_update():
        print(json.dumps({"metric": "collective_bytes_per_update", **r}))


if __name__ == "__main__":
    main()
