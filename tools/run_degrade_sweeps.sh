#!/bin/bash
# Rerun the three parity degradation sweeps so the committed DegreData dirs
# carry usage.npy (measured actuations) — VERDICT r3 item #8.  Same models,
# seeds and protocol as the committed artifacts (deterministic: PRNGKey from
# --seed), so success/steps/health must reproduce exactly; usage.npy is new.
set -e
cd /root/repo
export JAX_PLATFORMS=cpu

python eva_degrade.py dmfb --evaluate_task=20 --fov=9 --drop_num=4 \
    --chip_size=50 --load_model_name=0_final --evaluate_epoch=50 \
    --data_dir=data-deg4d
python eva_degrade.py dmfb --evaluate_task=20 --fov=9 --drop_num=10 \
    --chip_size=50 --load_model_name=0_final --evaluate_epoch=40 \
    --data_dir=data-deg10d
python eva_degrade.py dmfb --evaluate_task=20 --fov=9 --drop_num=10 \
    --chip_size=20 --load_model_name=0_final --evaluate_epoch=20 \
    --data_dir=data-deg10d
echo ALL_SWEEPS_DONE
