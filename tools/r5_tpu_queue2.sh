#!/bin/bash
# Second TPU queue: runs after tools/r5_retry_s15.sh (watcher pid as $1).
# Seeds 18-19 extend the MEDA-4d stretched-decay study to N=8; then the
# painted-obs A/B gets its TPU number.
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
for s in 18 19; do
  echo "=== meda4d seed $s start $(date +%T) ==="
  timeout 3000 python train.py meda --drop_num=4 --n_parallel_envs=64 \
    --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
    --exact_steps=4000000 --data_dir=data-meda-4d-4m-s$s --seed=$s \
    > /tmp/meda4d_4m_s$s.log 2>&1
  echo "=== meda4d seed $s rc=$? $(date +%T) ==="
done
echo "=== painted-obs bench start $(date +%T) ==="
timeout 1800 python tools/scratch_painted_obs.py bench 16384 \
  > /tmp/painted_bench.log 2>&1
echo "=== painted-obs bench rc=$? $(date +%T) ==="
echo "=== queue2 done $(date +%T) ==="
