#!/bin/bash
# Fifth TPU queue (after queue4, watcher pid $1): clean-chip painted-obs
# A/B at the flagship config and a 10-droplet 20x20 config (where the
# O(N^2) layer-0 rebuild is 6x bigger).
set -u
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== painted bench flagship start $(date +%T) ==="
timeout 1800 python tools/scratch_painted_obs.py bench 16384 10 4 \
  > /tmp/painted_bench_clean.log 2>&1
echo "rc=$?"
echo "=== painted bench 20x20-10d start $(date +%T) ==="
timeout 1800 python tools/scratch_painted_obs.py bench 8192 20 10 \
  > /tmp/painted_bench_10d.log 2>&1
echo "rc=$?"
echo "=== queue5 done $(date +%T) ==="
