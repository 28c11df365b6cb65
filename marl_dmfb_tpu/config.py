"""Configuration: CLI args + per-droplet-count YAML hyperparameters.

Mirrors the reference's two-stage config system (``common/arguments.py`` +
``data-*/TrainParas/*.yaml``) with the same flags, defaults and quirks that
matter for parity (``n_steps`` in units of 100k, arguments.py:85,106;
evaluation always loading the 4d YAML, arguments.py:130), minus the
``os.chdir`` side effect (``common/config.py:5,13``) — output paths are
explicit here (``args.data_dir``).

TPU-specific additions are grouped at the bottom of :class:`Args`
(parallel env batch, learner device semantics).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple

import yaml

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@dataclasses.dataclass
class Args:
    # --- environment selection (common_args, arguments.py:11-55) ---
    name: str = "dmfb"
    seed: int = 12
    alg: str = "vdn"
    last_action: bool = True
    reuse_network: bool = True
    gamma: float = 0.99
    optimizer: str = "ADAM"
    evaluate_task: int = 100
    model_dir: str = "./model"
    result_dir: str = "./TrainResult"
    load_model: bool = False
    load_model_name: str = ""
    stall: bool = True
    drop_num: int = 4
    block_num: int = 0
    net: str = "crnn"
    fov: Optional[int] = None
    width: Optional[int] = None
    length: Optional[int] = None
    version: Optional[str] = None

    # --- training flags (train_args, arguments.py:83-93) ---
    n_steps: int = 20             # x100000 total env steps
    ith_run: int = 0
    replay_dir: str = ""
    evaluate_cycle: int = 100000
    online_eval: bool = True

    # --- evaluation flags (evaluate_args, arguments.py:113-122) ---
    show: bool = False
    show_save: bool = False
    b_degrade: bool = False
    per_degrade: float = 0.1
    evaluate_epoch: int = 20
    noise_eps: float = 0.0        # eval-time epsilon noise (degrade controls)

    # --- YAML net hyperparameters ---
    rnn_hidden_dim: int = 128
    qmix_hidden_dim: int = 32
    two_hyper_layers: bool = True
    hyper_hidden_dim: int = 32
    lr: float = 5e-4

    # --- YAML training hyperparameters ---
    n_episodes: int = 2
    epsilon: float = 1.0
    min_epsilon: float = 0.05
    anneal_steps: int = 150000
    epsilon_anneal_scale: str = "step"
    train_time: int = 1
    batch_size: int = 128
    buffer_size: int = 5000
    target_update_cycle: int = 200
    grad_norm_clip: float = 9.0

    # --- env-derived (filled from env.env_info()) ---
    n_actions: int = 0
    n_agents: int = 0
    obs_shape: Tuple[int, ...] = ()
    state_shape: int = 0
    episode_limit: int = 0

    # --- TPU-native additions ---
    n_parallel_envs: int = 0      # 0 -> auto (n_episodes for parity runs)
    data_dir: str = ""            # output root (replaces the chdir quirk)
    mesh: str = "auto"            # device mesh: auto | off | <n_devices>
    compute_dtype: str = "float32"  # float32 (parity) | bf16 (MXU-native)
    lr_decay: bool = False        # cosine lr decay (stabilizes large-B)
    local_sampling: bool = False  # per-device replay sampling (no gather)
    remat: bool = False           # rematerialize BPTT activations (HBM)
    fused_streams: bool = False   # eval+target GRU streams in one scan
    scan_unroll: int = 0          # BPTT scan unroll; 0 = auto (full if T<=64)
    vmap_seeds: int = 0           # train K independent seeds as ONE vmapped
    #                               program (parallel/seedfarm.py); 0 = off
    ckpt_replay: bool = False     # checkpoint replay ring + training env
    #                               states too -> bit-exact resume (big
    #                               checkpoints; see Trainer.save_model)
    param_ema: float = 0.0        # per-update EMA decay of eval params
    #                               (0 = off; e.g. 0.999 smooths the
    #                               late-training oscillation of large-B
    #                               runs; eval/save use the averaged params)

    def apply_env_defaults(self):
        """set_default (arguments.py:57-81)."""
        if self.name == "dmfb":
            if self.fov is None:
                self.fov = 9
            if self.width is None:
                self.width = 10
                self.length = 10
            elif self.length is None:
                self.length = self.width
        elif self.name == "meda":
            if self.version is None:
                self.version = "0.2"
            if self.fov is None:
                self.fov = 19
            if self.width is None:
                if self.drop_num == 10:
                    self.width = 80
                    self.length = 80
                else:
                    self.width = 30
                    self.length = 60
            elif self.length is None:
                self.length = self.width
        if not self.data_dir:
            self.data_dir = f"data-{self.name}"
        return self

    def load_yaml(self, drop_num: Optional[int] = None):
        """Merge TrainParas/<n>d.yaml (arguments.py:101-105)."""
        d = self.drop_num if drop_num is None else drop_num
        path = os.path.join(_DATA_DIR, self.name, f"{d}d.yaml")
        with open(path) as f:
            netdata, traindata = yaml.safe_load_all(f.read())
        for k, v in {**netdata, **traindata}.items():
            setattr(self, k, v)
        return self

    def update_env_info(self, info: dict):
        for k, v in info.items():
            setattr(self, k, v)
        return self

    @property
    def total_env_steps(self) -> int:
        return self.n_steps  # already scaled by get_train_args

    @property
    def rollout_batch(self) -> int:
        return self.n_parallel_envs if self.n_parallel_envs > 0 else self.n_episodes


def _common_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("name", default="dmfb", choices=["dmfb", "meda"])
    p.add_argument("--seed", type=int, default=12)
    p.add_argument("--alg", type=str, default="vdn")
    p.add_argument("--last_action", default=True, action="store_false")
    p.add_argument("--reuse_network", default=True, action="store_false")
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--optimizer", type=str, default="ADAM")
    p.add_argument("--evaluate_task", type=int, default=100)
    p.add_argument("--model_dir", type=str, default="./model")
    p.add_argument("--result_dir", type=str, default="./TrainResult")
    p.add_argument("--load_model", default=False, action="store_true")
    p.add_argument("--load_model_name", type=str, default="")
    p.add_argument("--stall", default=True, action="store_false")
    p.add_argument("--drop_num", "-d", type=int, default=4)
    p.add_argument("--block_num", type=int, default=0)
    p.add_argument("--net", type=str, default="crnn")
    p.add_argument("--fov", type=int, default=None)
    p.add_argument("--width", "-w", "--chip_size", type=int, default=None)
    p.add_argument("--length", "-l", type=int, default=None)
    p.add_argument("--version", "-v", type=str, default=None)
    p.add_argument("--n_parallel_envs", type=int, default=0,
                   help="TPU: number of envs simulated in lockstep (0=auto)")
    p.add_argument("--data_dir", type=str, default="",
                   help="output root (default data-<env>/, like the reference)")
    p.add_argument("--mesh", type=str, default="auto",
                   help="device mesh for sharded training: 'auto' (all "
                        "devices when >1), 'off' (single device), or a "
                        "device count")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bf16"],
                   help="net matmul/conv precision: bf16 uses the MXU's "
                        "native format (f32 params + accumulation)")
    return p


def get_train_args(argv=None, pri: bool = True) -> Args:
    p = _common_parser()
    p.add_argument("--n_steps", type=int, default=20,
                   help="total env steps for training x100000")
    p.add_argument("--exact_steps", type=int, default=0,
                   help="dev override: exact env-step budget (bypasses x100000)")
    p.add_argument("--ith_run", "-i", type=int, default=0)
    p.add_argument("--replay_dir", type=str, default="")
    p.add_argument("--evaluate_cycle", type=int, default=100000)
    p.add_argument("--online_eval", default=True, action="store_false")
    p.add_argument("--lr_decay", default=False, action="store_true",
                   help="cosine lr decay to 5%% over training (stabilizes "
                        "large --n_parallel_envs runs)")
    p.add_argument("--local_sampling", default=False, action="store_true",
                   help="with --mesh: each device samples its learn "
                        "minibatch share from ITS OWN replay shard (no "
                        "cross-device episode gather per update — saves "
                        "ICI bandwidth on real pods); stratified-uniform "
                        "instead of global-uniform sampling")
    p.add_argument("--vmap_seeds", type=int, default=0,
                   help="train K independent seeds (args.seed..seed+K-1) "
                        "simultaneously as one vmapped program — a "
                        "seed-stability study for roughly the cost of one "
                        "run; per-seed checkpoints land at ith_run=i and "
                        "per-seed curves beside a stacked *_farm.npy")
    p.add_argument("--ckpt_replay", default=False, action="store_true",
                   help="include the replay ring and training env states "
                        "in checkpoints for BIT-EXACT resume (identical "
                        "trajectories to an uninterrupted run, wear maps "
                        "preserved under --b_degrade); off by default — "
                        "the replay dominates checkpoint size (a MEDA "
                        "10k-episode buffer is ~5GB)")
    p.add_argument("--remat", default=False, action="store_true",
                   help="rematerialize BPTT activations in the learn step "
                        "(fits large MEDA configs in HBM at ~1.3x FLOPs)")
    p.add_argument("--fused_streams", default=False, action="store_true",
                   help="run the eval and target GRU unrolls in one scan "
                        "(loss-identical; measured SLOWER on v5e — see "
                        "RESULTS.md Profiling — kept for other topologies)")
    p.add_argument("--scan_unroll", type=int, default=0,
                   help="lax.scan unroll factor for the BPTT time scans in "
                        "the learn step (trades compile time/code size for "
                        "fewer loop iterations); 0 = auto, fully unrolling "
                        "short horizons (T<=64, ~20%% faster at T=40 on "
                        "v5e) and leaving longer ones rolled")
    p.add_argument("--param_ema", type=float, default=0.0,
                   help="per-update EMA decay for evaluation params "
                        "(e.g. 0.999): online eval and saved checkpoints "
                        "use the exponential moving average of the "
                        "network weights, smoothing late-training policy "
                        "oscillation at large --n_parallel_envs")
    p.add_argument("--buffer_size", type=int, default=None,
                   help="override the YAML replay capacity (episodes) — "
                        "e.g. to fit large MEDA configs in 16GB HBM")
    p.add_argument("--batch_size", type=int, default=None,
                   help="override the YAML learner minibatch (episodes)")
    ns = p.parse_args(argv)
    d = vars(ns)
    exact_steps = d.pop("exact_steps", 0)
    overrides = {k: d.pop(k) for k in ("buffer_size", "batch_size")
                 if d.get(k) is not None}
    d.pop("buffer_size", None)
    d.pop("batch_size", None)
    args = Args(**d)
    args.apply_env_defaults()
    args.load_yaml()
    for k, v in overrides.items():  # CLI beats YAML
        setattr(args, k, v)
    args.n_steps = exact_steps or args.n_steps * 100000  # arguments.py:106
    if pri:
        print("drop number:", args.drop_num)
        print("chip size:", args.width, "*", args.length)
        print("FOV size:", args.fov)
    return args


def get_evaluate_args(argv=None) -> Args:
    p = _common_parser()
    p.add_argument("--show", default=False, action="store_true")
    p.add_argument("--show_save", default=False, action="store_true")
    p.add_argument("--b-degrade", dest="b_degrade", default=True)
    p.add_argument("--per-degrade", dest="per_degrade", type=float, default=0)
    p.add_argument("--evaluate_epoch", type=int, default=20)
    p.add_argument("--noise_eps", type=float, default=0.0,
                   help="epsilon-greedy noise during evaluation (0 = greedy "
                        "parity with the reference). Used by eva_degrade.py "
                        "control sweeps: a deliberately weakened policy "
                        "takes more steps per episode, actuates electrodes "
                        "more, and collapses under wear like the "
                        "reference's committed DegreData baselines")
    p.set_defaults(load_model=True)
    ns = p.parse_args(argv)
    args = Args(**vars(ns))
    args.apply_env_defaults()
    # quirk parity: evaluation always loads the 4-droplet YAML's net section
    # (arguments.py:130) so checkpoints built with those net dims load.
    args.load_yaml(drop_num=4)
    return args


def make_env_from_args(args: Args):
    """Construct the functional env from parsed args (replaces
    common/config.py's class lookup + chdir)."""
    from marl_dmfb_tpu.envs import make_env

    common = dict(
        width=args.width,
        length=args.length,
        n_droplets=args.drop_num,
        fov=args.fov,
        stall=args.stall,
        b_degrade=args.b_degrade,
        per_degrade=args.per_degrade,
    )
    if args.name == "dmfb":
        return make_env("dmfb", version=args.version, n_blocks=args.block_num,
                        **common)
    return make_env("meda", version=args.version, **common)
