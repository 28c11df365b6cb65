#!/bin/bash
# Round-5 TPU job queue (sequential: one process at a time on the tunneled
# chip).  1) MEDA-4d stretched-decay seeds 15-17 (extends the seed study to
# N=6), 2) bf16 trained-to-quality runs (DMFB flagship + MEDA 3d).
set -u
cd /root/repo
for s in 15 16 17; do
  echo "=== meda4d seed $s start $(date +%T) ==="
  timeout 3000 python train.py meda --drop_num=4 --n_parallel_envs=64 \
    --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
    --exact_steps=4000000 --data_dir=data-meda-4d-4m-s$s --seed=$s \
    > /tmp/meda4d_4m_s$s.log 2>&1
  echo "=== meda4d seed $s rc=$? $(date +%T) ==="
done
echo "=== bf16 dmfb flagship start $(date +%T) ==="
timeout 3000 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --compute_dtype=bf16 --data_dir=data-bf16-dmfb \
  > /tmp/bf16_dmfb.log 2>&1
echo "=== bf16 dmfb rc=$? $(date +%T) ==="
echo "=== bf16 meda3d start $(date +%T) ==="
timeout 4500 python train.py meda --drop_num=3 --n_parallel_envs=64 \
  --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --compute_dtype=bf16 --data_dir=data-bf16-meda3d \
  > /tmp/bf16_meda3d.log 2>&1
echo "=== bf16 meda3d rc=$? $(date +%T) ==="
echo "=== queue done $(date +%T) ==="
