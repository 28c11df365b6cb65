#!/bin/bash
# High-n independent re-evals for the MEDA-4d seed study: 500 fresh tasks
# per seed (binomial 95% CI ~ +-2.2% at p=0.93 vs +-5% at n=100), 3-way
# concurrent on the 4-core host.  Outputs /tmp/highn_s<seed>.log; assemble
# with tools/reeval_meda4d_highn_collect.py.
set -u
cd /root/repo
run() {
  JAX_PLATFORMS=cpu nice -n 5 timeout 5400 python evaluate.py meda \
    --drop_num=4 --evaluate_task=500 --load_model_name=0_final \
    --data_dir="$2" > "/tmp/highn_s$1.log" 2>&1
  echo "seed $1 rc=$?"
}
pids=()
n=0
while read -r s d; do
  [ -d "$d/model/vdn/fov19/0_final_state" ] || continue
  run "$s" "$d" &
  pids+=($!)
  n=$((n+1))
  if [ $((n % 3)) -eq 0 ]; then wait; fi
done <<'EOF'
12 data-meda-4d-4m
13 data-meda-4d-4m-s13
14 data-meda-4d-4m-s14
15 data-meda-4d-4m-s15
16 data-meda-4d-4m-s16
17 data-meda-4d-4m-s17
18 data-meda-4d-4m-s18
19 data-meda-4d-4m-s19
EOF
wait
echo HIGHN_DONE
