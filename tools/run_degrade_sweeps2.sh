#!/bin/bash
set -e
cd /root/repo
export JAX_PLATFORMS=cpu
# eps=0.3 control (same 10x10-4d policy as the 4d parity sweep)
python eva_degrade.py dmfb --evaluate_task=20 --fov=9 --drop_num=4 \
    --chip_size=50 --load_model_name=0_final --evaluate_epoch=50 \
    --noise_eps=0.3 --data_dir=data-deg4d-v0
# MEDA sweeps
python eva_degrade.py meda --evaluate_task=20 --drop_num=2 \
    --load_model_name=0_final --evaluate_epoch=20 --data_dir=data-degmeda2
python eva_degrade.py meda --evaluate_task=20 --drop_num=3 \
    --load_model_name=0_final --evaluate_epoch=20 --data_dir=data-degmeda3
python eva_degrade.py meda --evaluate_task=20 --drop_num=4 \
    --load_model_name=0_final --evaluate_epoch=20 --data_dir=data-degmeda4
python eva_degrade.py meda --evaluate_task=20 --drop_num=10 \
    --load_model_name=0_final --evaluate_epoch=20 --data_dir=data-degmeda10
echo ALL_SWEEPS2_DONE
