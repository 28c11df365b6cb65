"""Evaluate a trained model on fresh random tasks (reference evaluate.py).

Usage:
    python evaluate.py dmfb --drop_num=4 --chip_size=20 --evaluate_task=100 \
        --load_model_name=0_final
The generalization workload: a model trained on 10x10 runs on larger chips
because observations are FOV-local (reference evaluate.py:7-29).
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

import time

from marl_dmfb_tpu.config import get_evaluate_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer, restore_net_config


def main():
    args = get_evaluate_args()
    env = make_env_from_args(args)
    tag = None
    if args.load_model:
        tag = args.load_model_name or "final"
        # accept both "0_final" (run-prefixed) and "final"
        if tag.startswith(f"{args.ith_run}_"):
            tag = tag[len(f"{args.ith_run}_"):]
        tag = tag.rstrip("_")
        restore_net_config(args, tag)
    trainer = Trainer(env, args)
    if tag is not None:
        trainer.load_model(tag)
    start = time.time()
    m = trainer.evaluate()
    print("time:", time.time() - start)
    print("The average total_rewards of {} is  {}".format(args.alg, m["reward"]))
    print("The average total_steps is: {}".format(m["steps"]))
    print("The successful rate is: {}".format(m["success_rate"]))


if __name__ == "__main__":
    main()
