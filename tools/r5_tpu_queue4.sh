#!/bin/bash
# Final TPU queues merged (after queue3, watcher pid $1): wait for the
# orphaned s19 trainer to exit too, retry s19 only if it left no final,
# TPU-platform re-evals (platform-gap probe), clean bf16/f32 cadence A/B,
# clean painted-obs A/B at two configs.
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
while [ -n "$(pgrep -f 'data-meda-4d-4m-s19' || true)" ]; do sleep 30; done
if [ ! -d data-meda-4d-4m-s19/model/vdn/fov19/0_final_state ]; then
  echo "=== retry meda4d seed 19 start $(date +%T) ==="
  timeout 3000 python train.py meda --drop_num=4 --n_parallel_envs=64 \
    --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
    --exact_steps=4000000 --data_dir=data-meda-4d-4m-s19 --seed=19 \
    > /tmp/meda4d_4m_s19.log 2>&1
  echo "=== retry seed 19 rc=$? $(date +%T) ==="
fi
for s in 16 13; do
  echo "=== TPU re-eval s$s start $(date +%T) ==="
  timeout 1800 python evaluate.py meda --drop_num=4 --evaluate_task=500 \
    --load_model_name=0_final --data_dir=data-meda-4d-4m-s$s \
    > /tmp/tpu_reeval_s$s.log 2>&1
  echo "=== TPU re-eval s$s rc=$? ==="
done
echo "=== clean bf16 cadence start $(date +%T) ==="
rm -rf /tmp/bf16-cadence
timeout 1800 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --compute_dtype=bf16 --exact_steps=500000 --data_dir=/tmp/bf16-cadence \
  > /tmp/bf16_cadence.log 2>&1
echo "rc=$?"
echo "=== clean f32 cadence start $(date +%T) ==="
rm -rf /tmp/f32-cadence
timeout 1800 python train.py dmfb --drop_num=4 --fov=9 --chip_size=20 \
  --n_parallel_envs=64 --lr_decay --param_ema=0.999 --evaluate_cycle=50000 \
  --exact_steps=500000 --data_dir=/tmp/f32-cadence \
  > /tmp/f32_cadence.log 2>&1
echo "rc=$?"
echo "=== painted bench flagship start $(date +%T) ==="
timeout 1800 python tools/scratch_painted_obs.py bench 16384 10 4 \
  > /tmp/painted_bench_clean.log 2>&1
echo "rc=$?"
echo "=== painted bench 20x20-10d start $(date +%T) ==="
timeout 1800 python tools/scratch_painted_obs.py bench 8192 20 10 \
  > /tmp/painted_bench_10d.log 2>&1
echo "rc=$?"
echo "=== queue4 done $(date +%T) ==="
