"""Scratch: fold the MEDA time-to-quality curves into
artifacts/time_to_quality.json (VERDICT r3 #7).  Reads the training run's
success_rate/runtime npy curves (online eval = greedy EMA params, 100 fresh
tasks on the train board — the artifact quality protocol)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import json
import sys

import numpy as np

run_dir, key, bar = sys.argv[1], sys.argv[2], float(sys.argv[3])
extra_note = sys.argv[4] if len(sys.argv) > 4 else ""

s = np.load(glob.glob(run_dir + "/*success_rate_0.npy")[0])
rt = np.load(glob.glob(run_dir + "/*runtime_0.npy")[0])
ckpts = [{"tag": str(i), "env_steps": i * 50000, "wall_s": round(float(w), 1),
          "success": round(float(x), 2)}
         for i, (x, w) in enumerate(zip(s, rt))]
# final entry is the run's final checkpoint (2M steps)
ckpts[-1]["tag"] = "final"
ckpts[-1]["env_steps"] = 2000000

first = next((c for c in ckpts if c["success"] >= bar), None)

with open("artifacts/time_to_quality.json") as f:
    data = json.load(f)

entry = {
    "description": (
        "MEDA 30x60 time-to-quality: python train.py meda --drop_num=<n> "
        "--n_parallel_envs=64 --lr_decay --param_ema=0.999 "
        "--evaluate_cycle=50000 (2M env steps); success = online greedy "
        "eval of the EMA params on 100 fresh train-board tasks per "
        "checkpoint.  Measured 2026-08-20 on one tunneled TPU v5e chip; "
        "wall_s includes evals + checkpoint saves AND the ~230-450s "
        "first-compile of the MEDA programs over the tunnel (see "
        "per-checkpoint cadence for chip time)." + extra_note
    ),
    "quality_bar": bar,
    "first_crossing": first,
    "total_run": {
        "env_steps": 2000000,
        "wall_s": ckpts[-1]["wall_s"],
        "success_final": ckpts[-1]["success"],
    },
    "checkpoints": ckpts,
}
data[key] = entry
with open("artifacts/time_to_quality.json", "w") as f:
    json.dump(data, f, indent=1)
print(key, "first_crossing:", first, "final:", ckpts[-1])
