"""Full training-loop throughput benchmark: rollout + replay store + K
gradient updates, end to end, on the flagship DMFB 10x10-4d config.

Prints one JSON line per phase (actor-only, learn-only, full loop).  The
headline bench.py reports the actor loop; this gives the learner picture.
"""

import json
import os

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from marl_dmfb_tpu import replay as replay_lib
from marl_dmfb_tpu.algos.qlearn import make_learner
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.rollout import make_rollout


def estimate_learn_flops(args) -> float:
    """Analytic FLOPs of ONE TD learn step (batch, T, N from args).

    Counts matmul/conv multiply-adds only (2 FLOPs each): eval stream
    forward + backward (~3x fwd) plus target stream forward (~1x fwd) ->
    ~4x the single-stream forward cost.  Elementwise ops are ignored
    (<2% of FLOPs, though not of time on small shapes)."""
    from marl_dmfb_tpu.models.networks import conv_plan, conv_out_size

    fov, C = args.fov, args.obs_shape[0]
    ch = args.hyper_hidden_dim
    H = args.rnn_hidden_dim
    A = args.n_actions
    in_dim = args.obs_shape[-1] + (A if args.last_action else 0)

    f = 0.0
    size, cin = fov, C
    for s in conv_plan(fov):
        size = (size - 3) // s + 1
        f += size * size * ch * cin * 9 * 2
        cin = ch
    flat = conv_out_size(fov) ** 2 * ch
    f += (in_dim - C * fov * fov) * 10 * 2          # vec mlp
    gru_in = flat + 10
    f += (gru_in * 3 * H + H * 3 * H) * 2           # GRU matmuls
    f += H * A * 2                                  # Q head
    per_sample_step = f
    samples = args.batch_size * args.n_agents * args.episode_limit
    return 4.0 * per_sample_step * samples


def main(B=1024, iters=3, compute_dtype="float32"):
    args = Args(name="dmfb", drop_num=4, fov=9, width=10, length=10,
                n_parallel_envs=B, compute_dtype=compute_dtype)
    args.apply_env_defaults()
    args.load_yaml()
    env = make_env("dmfb", width=10, length=10, n_droplets=4, fov=9)
    args.update_env_info(env.env_info())
    init, learn, net, learn_many, _ = make_learner(args, env)
    lstate = init(jax.random.PRNGKey(0))
    rollout = make_rollout(env, net, args.rnn_hidden_dim)
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), B))
    rb = replay_lib.init_replay(
        capacity=args.buffer_size, episode_limit=args.episode_limit,
        n_agents=4, obs_dim=args.obs_shape[-1], n_actions=args.n_actions,
    )
    T = env.episode_limit
    updates = max(1, round(args.train_time * B / args.n_episodes))

    def cycle(lstate, states, rb, key):
        res = rollout(lstate.params["agent"], states, key,
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                      greedy=False)
        rb = replay_lib.store(rb, res.episodes)
        key, sub = jax.random.split(key)
        lstate, loss = learn_many(lstate, rb.data, rb.size, sub, updates)
        return lstate, res.env_states, rb, loss

    # Timing: host-read sync + one RTT subtracted — block_until_ready over
    # the axon tunnel can return before remote execution finishes (see
    # marl_dmfb_tpu/utils/benchmarking.py).
    from marl_dmfb_tpu.utils.benchmarking import hostread, timeit_chained

    lstate, states, rb, loss = cycle(lstate, states, rb, jax.random.PRNGKey(2))
    hostread(loss)

    # learn-only
    batch = replay_lib.sample(rb, jax.random.PRNGKey(3), args.batch_size)

    def learn_step(i, carry):
        # carry is the initial LearnerState (a NamedTuple with .params) or
        # learn's (state, loss) result tuple
        ls = carry if hasattr(carry, "params") else carry[0]
        return learn(ls, batch)

    dt_learn = timeit_chained(learn_step, lstate, iters=100)
    print(json.dumps({"metric": "learn_step_ms",
                      "value": round(dt_learn * 1000, 2), "unit": "ms",
                      "vs_baseline": None}))
    flops = estimate_learn_flops(args)
    tflops = flops / dt_learn / 1e12
    print(json.dumps({
        "metric": "learn_step_tflops",
        "value": round(tflops, 2),
        "unit": f"TFLOP/s analytic ({compute_dtype}); v5e peak ~197 bf16 / ~49 f32",
        "vs_baseline": round(tflops / 197.0, 4),  # MFU vs bf16 peak
    }))

    # full loop
    def cycle_step(i, carry):
        ls, st, r, _ = carry
        return cycle(ls, st, r, jax.random.PRNGKey(4 + i))

    dt = timeit_chained(cycle_step, (lstate, states, rb, loss), iters=iters)
    sps = B * T / dt
    print(json.dumps({"metric": "train_loop_env_steps_per_sec",
                      "value": round(sps), "unit": "env-steps/s",
                      "vs_baseline": round(sps / 1e6, 4)}))

    # headline: throughput at the reference replay ratio + ms/update —
    # everything in this line is measured by THIS run
    print(json.dumps({
        "metric": "train_e2e",
        "value": round(sps),
        "unit": (f"env-steps/s at the reference replay ratio ({updates} "
                 f"updates per {B}-episode rollout); learn "
                 f"{dt_learn * 1000:.2f} ms/update"),
        "vs_baseline": round(sps / 1e6, 4),
    }))

    # recorded time-to-quality (separate line, NOT measured by this run:
    # sourced from the committed artifact of a full 2M-step training of the
    # flagship recipe evaluated per 50k-step checkpoint on the 50x50
    # zero-shot board; re-measure by re-running that recipe)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts", "time_to_quality.json")) as f:
            ttq = json.load(f)["first_crossing"]
        print(json.dumps({
            "metric": "time_to_quality_recorded",
            "value": ttq["wall_s"],
            "unit": (f"s wall-clock to >=0.96 on 50x50 zero-shot "
                     f"({ttq['env_steps']} env steps, flagship 20x20 "
                     f"recipe)"),
            "source": "artifacts/time_to_quality.json",
            "vs_baseline": None,
        }))
    except (OSError, KeyError, ValueError):
        pass


if __name__ == "__main__":
    import sys

    main(B=int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         compute_dtype=sys.argv[2] if len(sys.argv) > 2 else "float32")
