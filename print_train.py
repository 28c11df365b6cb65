"""Print saved training curves, or re-run the offline checkpoint sweep when
``--load_model`` is given (reference printTrain.py).

Usage:
    python print_train.py dmfb --drop_num=4 --fov=9              # print npys
    python print_train.py dmfb --drop_num=4 --fov=9 --load_model # re-evaluate
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import os

import numpy as np

from marl_dmfb_tpu.config import get_train_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer


def main(argv=None):
    args = get_train_args(argv)
    if args.load_model:
        env = make_env_from_args(args)
        trainer = Trainer(env, args, eval_only=True)
        trainer.evaluate_total()
        rewards = trainer.episode_rewards
        steps = trainer.episode_steps
        constraints = trainer.episode_constraints
        success_rate = trainer.success_rate
        runtime = trainer.time_cost
    else:
        base = os.path.join(
            args.data_dir, args.result_dir.lstrip("./"), args.alg,
            f"fov{args.fov}",
            f"{args.width}by{args.length}-{args.drop_num}d{args.block_num}b",
        )
        prefix = (f"{args.alg}_env({args.width},{args.length},{args.drop_num},"
                  f"{args.block_num},{args.fov},{args.stall})")
        load = lambda name: np.load(
            os.path.join(base, f"{prefix}{name}_{args.ith_run}.npy")
        )
        rewards, steps = load("Rewards"), load("steps")
        constraints, success_rate = load("constraints"), load("success_rate")
        runtime = load("runtime")
    print("The rewards are:  {}".format(rewards))
    print("The steps is: {}".format(steps))
    print("The successful rate are: {}".format(success_rate))
    print("The runtime are: {}".format(runtime))
    print("The constraints are: {}".format(constraints))


if __name__ == "__main__":
    main()
