#!/bin/bash
# Regenerate the three PARITY degradation sweeps (the reference's committed
# DegreData configs) on the CPU platform — the deterministic platform the
# committed artifacts are pinned to (see artifacts/README.md provenance).
#
# Stage the policy checkpoints first (the sweeps are deterministic given
# policy + seed 12 (config default) + platform, so reruns must reproduce
# the committed arrays bit-for-bit):
#   data-deg4d/model/vdn/fov9/0_final_state   <- artifacts/dmfb_10x10_4d_fov9_vdn
#   data-deg10d/model/vdn/fov9/0_final_state  <- artifacts/dmfb_20x20_10d_fov9_vdn
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
