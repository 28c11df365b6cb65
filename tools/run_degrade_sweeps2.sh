#!/bin/bash
# Regenerate the eps-control and MEDA degradation sweeps (CPU platform —
# see artifacts/README.md provenance).  Stage checkpoints first:
#   data-deg4d-v0/model/vdn/fov9/0_final_state    <- artifacts/dmfb_10x10_4d_fov9_vdn
#       (the SAME policy as the 4d parity sweep; the round-3 control had
#        mistakenly staged the 20x20-b64 flagship here — that sweep is
#        preserved as artifacts/DegreData/50by50-4d0b-eps0.3-b64flagship/)
#   data-degmeda2/model/vdn/fov19/0_final_state   <- artifacts/meda_30x60_2d_fov19_vdn
#   data-degmeda3/model/vdn/fov19/0_final_state   <- artifacts/meda_30x60_3d_fov19_vdn
#   data-degmeda4/model/vdn/fov19/0_final_state   <- artifacts/meda_30x60_4d_fov19_vdn
#   data-degmeda10/model/vdn/fov19/0_final_state  <- artifacts/meda_80x80_10d_fov19_vdn
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
