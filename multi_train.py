"""Sequential hyperparameter sweep of full trainings (reference
multiTrain.py): fov in {7,5,9} x drop_num in {3,4} on DMFB, offline
evaluation mode (train, then evaluate every saved checkpoint).

Usage:
    python multi_train.py [extra train.py flags...]
    python multi_train.py --sweep_fovs=5,9 --sweep_drops=4 [flags...]

``--sweep_fovs``/``--sweep_drops`` override the reference's hard-coded
grid (multiTrain.py:8-23); all other flags pass through to the per-combo
training (the swept fov/drop_num and the reference's n_steps=20 budget
take precedence, as in the reference).
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import sys

from marl_dmfb_tpu.config import get_train_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer


def _pop_sweep_flag(argv, name, default):
    vals, rest = default, []
    for a in argv:
        if a.startswith(f"--{name}="):
            vals = [int(v) for v in a.split("=", 1)[1].split(",") if v]
        else:
            rest.append(a)
    return vals, rest


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    fovs, argv = _pop_sweep_flag(argv, "sweep_fovs", [7, 5, 9])
    drops, argv = _pop_sweep_flag(argv, "sweep_drops", [3, 4])
    for fov in fovs:
        for d in drops:
            args = get_train_args(
                argv + ["dmfb", "--n_steps=20",
                        f"--fov={fov}", f"--drop_num={d}",
                        "--ith_run=5"],
                pri=False,
            )
            args.load_model = False
            print("drop number:", args.drop_num)
            print("chip size:", args.width, "*", args.length)
            print("FOV size:", args.fov)
            env = make_env_from_args(args)
            trainer = Trainer(env, args)
            trainer.run(online_evaluate=False)  # -> evaluate_total


if __name__ == "__main__":
    main()
