#!/bin/bash
# Third TPU queue (after tools/r5_tpu_queue2.sh, watcher pid $1):
# bench_train artifact + clean-host bf16/f32 cadence A/B.
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== bench_train start $(date +%T) ==="
timeout 2400 python bench_train.py > /tmp/bench_train_r05.log 2>&1
echo "=== bench_train rc=$? ==="
echo "=== bf16 cadence run start $(date +%T) ==="
timeout 1800 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --compute_dtype=bf16 --exact_steps=500000 --data_dir=/tmp/bf16-cadence \
  > /tmp/bf16_cadence.log 2>&1
echo "=== bf16 cadence rc=$? ==="
echo "=== f32 cadence control start $(date +%T) ==="
timeout 1800 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --exact_steps=500000 --data_dir=/tmp/f32-cadence \
  > /tmp/f32_cadence.log 2>&1
echo "=== f32 cadence rc=$? ==="
echo "=== queue3 done $(date +%T) ==="
