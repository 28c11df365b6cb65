#!/bin/bash
# Wait for the main r5 queue (pid given) to exit, then retry seed 15,
# which died on a transient RESOURCE_EXHAUSTED at its first ckpt save.
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== retry meda4d seed 15 start $(date +%T) ==="
timeout 3000 python train.py meda --drop_num=4 --n_parallel_envs=64 \
  --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --exact_steps=4000000 --data_dir=data-meda-4d-4m-s15 --seed=15 \
  > /tmp/meda4d_4m_s15.log 2>&1
echo "=== retry seed 15 rc=$? $(date +%T) ==="
