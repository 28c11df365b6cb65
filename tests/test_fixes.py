"""Regression tests for round-2 fixes: degradation-sweep output label,
loud checkpoint failures, per-leaf restore validation, episode-scale
epsilon annealing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_dmfb_tpu import checkpoint as ckpt
from marl_dmfb_tpu.config import Args
from marl_dmfb_tpu.envs import make_env
from marl_dmfb_tpu.trainer import Trainer


def small_args(tmp_path, **kw):
    args = Args(
        name="dmfb", alg="vdn", drop_num=2, fov=5,
        batch_size=8, buffer_size=32, n_parallel_envs=4,
        evaluate_task=4, evaluate_cycle=400, n_steps=700,
        anneal_steps=500, data_dir=str(tmp_path),
    )
    args.width = args.length = 5
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_degre_dir_uses_length_for_nonsquare():
    """eva_degrade output label must be <W>by<L> (reference evaDegre.py:47-49)
    — regression for the {width}by{width} bug (wrong for MEDA 30x60)."""
    from eva_degrade import degre_dir

    args = Args(name="meda", drop_num=4)
    args.width, args.length, args.data_dir = 30, 60, "/tmp/x"
    assert degre_dir(args).endswith("DegreData/30by60-4d0b")


def test_restore_missing_checkpoint_raises():
    with pytest.raises(FileNotFoundError):
        ckpt.restore("/tmp/definitely/not/a/checkpoint/path")


def test_load_model_rejects_mismatched_net(tmp_path):
    """A checkpoint saved under different net dims must fail loudly
    (per-leaf shape validation), not restore silently permuted state."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    t1 = Trainer(env, small_args(tmp_path))
    t1.save_model("mismatch")

    args2 = small_args(tmp_path, rnn_hidden_dim=32)
    t2 = Trainer(env, args2)
    with pytest.raises(ValueError, match="shape mismatch"):
        t2.load_model("mismatch")


def test_load_model_params_only_ignores_opt_state_shape(tmp_path):
    """Eval entry points restore with params_only=True: a checkpoint
    trained with --lr_decay (extra schedule-counter leaf in opt_state)
    must still evaluate from a Trainer built without the flag."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    t1 = Trainer(env, small_args(tmp_path, lr_decay=True))
    t1.save_model("lrdk")

    t2 = Trainer(env, small_args(tmp_path))  # no lr_decay -> fewer leaves
    with pytest.raises(ValueError, match="structure mismatch"):
        t2.load_model("lrdk")
    t2.load_model("lrdk", params_only=True)
    for a, b in zip(jax.tree.leaves(t1.learner_state.params),
                    jax.tree.leaves(t2.learner_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_ema_tracks_and_restores(tmp_path):
    """--param_ema keeps an EMA of the net params: after a train cycle the
    EMA sits strictly between init and live params, evaluation uses it,
    and a params_only restore of the checkpoint yields the EMA."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, small_args(tmp_path, param_ema=0.9))
    p0 = jax.tree.map(np.asarray, tr.learner_state.params)
    tr.train_cycle()
    live = tr.learner_state.params
    kernel = lambda t: np.asarray(
        jax.tree.leaves(t["agent"])[0], dtype=np.float64)
    a, b, e = kernel(p0), kernel(live), kernel(tr.ema_params)
    assert not np.allclose(a, b)       # training moved the params
    assert not np.allclose(e, b)       # ema lags the live params
    # ema = d*a + (1-d)*b with d = 0.9**updates_per_rollout
    d = 0.9 ** tr.updates_per_rollout
    np.testing.assert_allclose(e, d * a + (1 - d) * b, rtol=1e-4, atol=1e-6)

    tr.save_model("ema")
    t2 = Trainer(env, small_args(tmp_path))
    t2.load_model("ema", params_only=True)
    np.testing.assert_allclose(
        kernel(t2.learner_state.params), e, rtol=1e-6)


def test_params_only_restore_overrides_live_ema(tmp_path):
    """evaluate_total-style restores on a --param_ema trainer must score the
    RESTORED checkpoint, not the stale in-memory EMA: after
    load_model(params_only=True) the trainer evaluates with exactly the
    checkpoint's weights."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, small_args(tmp_path, param_ema=0.9))
    tr.save_model("t0")                      # checkpoint the init-state EMA
    saved = jax.tree.map(np.asarray, tr.ema_params)
    tr.train_cycle()                         # live EMA drifts away
    kernel = lambda t: np.asarray(jax.tree.leaves(t["agent"])[0])
    assert not np.allclose(kernel(saved), kernel(tr.ema_params))
    tr.load_model("t0", params_only=True)
    assert tr.ema_params is None             # live EMA dropped
    np.testing.assert_allclose(
        kernel(tr.learner_state.params), kernel(saved), rtol=1e-6)


def test_resume_param_ema_from_ema_less_checkpoint(tmp_path):
    """Resuming with --param_ema from a checkpoint saved WITHOUT it must
    anchor the EMA to the restored weights, not this process's random
    init."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, small_args(tmp_path))       # no EMA
    tr.train_cycle()
    tr.save_model("noema")
    t2 = Trainer(env, small_args(tmp_path, param_ema=0.9, seed=7))
    t2.load_model("noema")                        # full-state resume
    kernel = lambda t: np.asarray(jax.tree.leaves(t["agent"])[0])
    np.testing.assert_allclose(
        kernel(t2.ema_params), kernel(t2.learner_state.params), rtol=1e-6)


def test_mesh_replay_capacity_rounds_to_tile(tmp_path):
    """A buffer size that doesn't tile the mesh must be rounded up, not
    silently replicated onto every device (multi-GB HBM blowout)."""
    from marl_dmfb_tpu.parallel.mesh import make_mesh

    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, small_args(tmp_path, buffer_size=30), mesh=make_mesh())
    assert tr.replay.data["u"].shape[0] == 32     # rounded up to tile 8
    assert not tr.replay.data["u"].sharding.is_fully_replicated


def test_episode_anneal_scale_decrements_per_episode(tmp_path):
    """With epsilon_anneal_scale == 'episode', a rollout of B episodes
    consumes B schedule steps (reference decrements once per generated
    episode, rollout.py:126-127 + train.py:59-66)."""
    args = small_args(
        tmp_path, epsilon_anneal_scale="episode", anneal_steps=100,
        epsilon=1.0, min_epsilon=0.05,
    )
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, args)
    B = args.rollout_batch
    tr.train_cycle()
    expected = 1.0 - B * (1.0 - 0.05) / 100
    assert float(tr.epsilon) == pytest.approx(expected, abs=1e-6)
    # clamps at min_epsilon instead of going below
    for _ in range(40):
        tr.train_cycle()
    assert float(tr.epsilon) == pytest.approx(0.05, abs=1e-6)


def test_evaluate_rendered_writes_video_and_metrics(tmp_path):
    """--show_save path of evaluate.py: rendered evaluation returns the
    standard metric dict and writes an mp4 (reference evaluate.py:13-16)."""
    import os

    from evaluate import evaluate_rendered

    args = small_args(tmp_path, evaluate_task=2, show=False, show_save=True)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, args)
    m = evaluate_rendered(tr, args)
    assert set(m) == {"reward", "steps", "constraints", "success_rate"}
    assert 0.0 <= m["success_rate"] <= 1.0
    vids = os.listdir(os.path.join(str(tmp_path), "video"))
    assert any(v.startswith("eval-5by5-2d0b") for v in vids)


def test_bf16_compute_dtype_close_to_f32_and_trains(tmp_path):
    """--compute_dtype=bf16 runs matmuls/convs in bfloat16 with f32 params:
    Q-values stay close to the f32 path and a short training remains
    finite."""
    from marl_dmfb_tpu.models.networks import build_agent_net

    args = small_args(tmp_path)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args.update_env_info(env.env_info())

    net32 = build_agent_net(args)
    args.compute_dtype = "bf16"
    net16 = build_agent_net(args)

    in_dim = args.obs_shape[-1] + args.n_actions
    x = jax.random.normal(jax.random.PRNGKey(0), (16, in_dim))
    h = jnp.zeros((16, args.rnn_hidden_dim))
    params = net32.init(jax.random.PRNGKey(1), x, h)["params"]
    q32, h32 = net32.apply({"params": params}, x, h)
    q16, h16 = net16.apply({"params": params}, x, h)  # same f32 params
    assert jnp.asarray(q16).dtype == jnp.float32
    np.testing.assert_allclose(np.array(q32), np.array(q16),
                               atol=5e-2, rtol=5e-2)

    tr = Trainer(env, args)
    tr.train_cycle()
    assert np.isfinite(float(tr._last_loss))


def test_lr_decay_and_remat_train(tmp_path):
    """--lr_decay (cosine schedule) and --remat (BPTT rematerialization)
    both produce finite training updates and identical loss values for
    remat (a pure memory/FLOPs trade)."""
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.rollout import make_rollout

    args = small_args(tmp_path, lr_decay=True)
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    tr = Trainer(env, args)
    tr.train_cycle()
    assert np.isfinite(float(tr._last_loss))

    # remat changes memory, not math: one learn step must match exactly
    args_a = small_args(tmp_path)
    args_a.update_env_info(env.env_info())
    args_b = small_args(tmp_path, remat=True)
    args_b.update_env_info(env.env_info())
    init_a, learn_a, net, _, _ = make_learner(args_a, env)
    init_b, learn_b, _, _, _ = make_learner(args_b, env)
    lstate = init_a(jax.random.PRNGKey(0))
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), 4))
    rollout = make_rollout(env, net, args_a.rnn_hidden_dim)
    res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                  jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                  greedy=False)
    _, loss_a = learn_a(lstate, res.episodes)
    _, loss_b = learn_b(init_b(jax.random.PRNGKey(0)), res.episodes)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_eval_only_trainer_skips_replay(tmp_path):
    """Evaluation entry points must not allocate the training replay (a
    MEDA-10d YAML buffer alone exceeds HBM); eval_only still evaluates."""
    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args = small_args(tmp_path, buffer_size=10_000_000)  # would OOM if real
    tr = Trainer(env, args, eval_only=True)
    assert tr.replay is None and tr.env_states is None
    m = tr.evaluate()
    assert 0.0 <= m["success_rate"] <= 1.0
    with pytest.raises(RuntimeError, match="eval_only"):
        tr.train_cycle()


def test_fused_streams_loss_identical(tmp_path):
    """fused_streams (eval+target GRU in one scan) is a pure scheduling
    change: the learn loss must match the two-scan path exactly."""
    from marl_dmfb_tpu.algos.qlearn import make_learner
    from marl_dmfb_tpu.rollout import make_rollout

    env = make_env("dmfb", width=5, length=5, n_droplets=2, fov=5)
    args_a = small_args(tmp_path)
    args_a.update_env_info(env.env_info())
    args_b = small_args(tmp_path, fused_streams=True)
    args_b.update_env_info(env.env_info())
    init_a, learn_a, net, _, _ = make_learner(args_a, env)
    init_b, learn_b, _, _, _ = make_learner(args_b, env)
    lstate = init_a(jax.random.PRNGKey(0))
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(1), 4))
    rollout = make_rollout(env, net, args_a.rnn_hidden_dim)
    res = rollout(lstate.params["agent"], states, jax.random.PRNGKey(2),
                  jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.05),
                  greedy=False)
    s_a, loss_a = learn_a(lstate, res.episodes)
    s_b, loss_b = learn_b(init_b(jax.random.PRNGKey(0)), res.episodes)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=1e-7)


def test_cli_buffer_batch_overrides():
    """--buffer_size/--batch_size must beat the YAML values (needed to fit
    MEDA 80x80-10d's 16GiB default buffer in HBM)."""
    from marl_dmfb_tpu.config import get_train_args

    args = get_train_args(
        ["meda", "--drop_num=10", "--buffer_size=3000", "--batch_size=64"],
        pri=False,
    )
    assert args.buffer_size == 3000
    assert args.batch_size == 64
    # without overrides the YAML values survive
    args2 = get_train_args(["meda", "--drop_num=10"], pri=False)
    assert args2.buffer_size == 10000
    assert args2.batch_size == 128


def test_blocks_generation_jits_under_vmapped_reset():
    """n_blocks>0 reset must compile (no while_loop) and produce
    non-overlapping blocks that avoid task cells."""
    from marl_dmfb_tpu.envs import dmfb

    params = dmfb.DMFBParams(width=10, length=10, n_droplets=2, fov=9,
                             n_blocks=2)
    env = make_env("dmfb", width=10, length=10, n_droplets=2, fov=9,
                   n_blocks=2)
    states = jax.vmap(env.init)(jax.random.split(jax.random.PRNGKey(0), 8))
    states = jax.jit(jax.vmap(lambda s: env.reset(s, new=True)))(states)
    masks = np.array(states.block_mask)
    assert (masks.sum(axis=(1, 2)) == 2 * 4).all()
    # no block contains a start or goal cell
    pos = np.array(states.pos)
    goal = np.array(states.goal)
    for b in range(8):
        for (x, y) in list(pos[b]) + list(goal[b]):
            assert not masks[b, x, y]
