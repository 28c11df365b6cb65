"""Sequential hyperparameter sweep of full trainings (reference
multiTrain.py): fov in {7,5,9} x drop_num in {3,4} on DMFB, offline
evaluation mode.

Usage:
    python multi_train.py [extra train.py flags...]
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import sys

from marl_dmfb_tpu.config import get_train_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer


def main():
    for fov in [7, 5, 9]:
        for d in [3, 4]:
            args = get_train_args(
                sys.argv[1:] + ["dmfb", "--n_steps=20",
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
