#!/bin/bash
# Third TPU queue (after tools/r5_tpu_queue2.sh, watcher pid $1): the
# per-round bench artifacts + a clean-host bf16 cadence measurement.
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== bench_train start $(date +%T) ==="
timeout 2400 python bench_train.py > /tmp/bench_train_r05.log 2>&1
echo "=== bench_train rc=$? ==="
echo "=== bench_multiproc start $(date +%T) ==="
timeout 3600 python bench_multiproc.py > /tmp/bench_multiproc_r05.log 2>&1
echo "=== bench_multiproc rc=$? ==="
echo "=== bf16 cadence run start $(date +%T) ==="
timeout 1200 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --compute_dtype=bf16 --exact_steps=500000 --data_dir=/tmp/bf16-cadence \
  > /tmp/bf16_cadence.log 2>&1
echo "=== bf16 cadence rc=$? ==="
echo "=== f32 cadence control start $(date +%T) ==="
timeout 1200 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --exact_steps=500000 --data_dir=/tmp/f32-cadence \
  > /tmp/f32_cadence.log 2>&1
echo "=== f32 cadence rc=$? ==="
echo "=== queue3 done $(date +%T) ==="
