"""Independent re-evaluation of the MEDA 30x60-4d stretched-decay seed
study (VERDICT r4 #1): every seed's FINAL checkpoint, evaluated greedy on
100 fresh tasks through the public evaluate.py CLI (CPU platform — eval
programs compile far faster there than over the TPU tunnel, and the
committed artifacts stay platform-reproducible), plus the zero-shot scale
boards for the seed-12 model (ADVICE r4: those rows were prose-only).

Writes artifacts/meda4d_seed_study.json: per-seed online finals (from the
training curves) next to the independent re-evals, eval protocol metadata,
and the zero-shot rows.  Run AFTER the seed trainings finish:

    python tools/reeval_meda4d.py [--boards] [seed ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import re
import subprocess
import sys

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "artifacts", "meda4d_seed_study.json")

SEED_DIRS = {
    12: "data-meda-4d-4m",
    13: "data-meda-4d-4m-s13",
    14: "data-meda-4d-4m-s14",
    15: "data-meda-4d-4m-s15",
    16: "data-meda-4d-4m-s16",
    17: "data-meda-4d-4m-s17",
    18: "data-meda-4d-4m-s18",
    19: "data-meda-4d-4m-s19",
}
CURVE = ("TrainResult/vdn/fov19/30by60-4d0b/"
         "vdn_env(30,60,4,0,19,True)success_rate_0.npy")


def run_eval(data_dir, extra=()):
    """Drive the public evaluate.py CLI; parse its summary lines."""
    cmd = [sys.executable, "evaluate.py", "meda", "--drop_num=4",
           "--evaluate_task=100", "--load_model_name=0_final",
           f"--data_dir={data_dir}", *extra]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    succ = float(re.search(r"successful rate is: ([\d.]+)", r.stdout).group(1))
    steps = float(re.search(r"total_steps is: ([\d.]+)", r.stdout).group(1))
    return succ, steps


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    do_boards = "--boards" in argv
    argv = [a for a in argv if a != "--boards"]
    seeds = [int(a) for a in argv] or [
        s for s, d in SEED_DIRS.items()
        if os.path.exists(os.path.join(ROOT, d, CURVE))
        # curves are written DURING training; only completed runs count
        and os.path.isdir(os.path.join(
            ROOT, d, "model", "vdn", "fov19", "0_final_state"))
    ]
    prior = {}
    if os.path.exists(OUT):  # incremental: keep seeds evaluated earlier
        with open(OUT) as f:
            prior = json.load(f).get("seeds", {})
    study = {"config": "meda 30x60-4d fov19 vdn, stretched-decay 4M recipe",
             "recipe": ("python train.py meda --drop_num=4 "
                        "--n_parallel_envs=64 --lr_decay --param_ema=0.999 "
                        "--evaluate_cycle=50000 --exact_steps=4000000 "
                        "--seed=<s>"),
             "eval_protocol": ("independent greedy re-eval of the FINAL "
                               "checkpoint (EMA deploy params) on 100 fresh "
                               "tasks via evaluate.py, CPU platform, eval "
                               "seed 12 (same task draw for every policy)"),
             "quality_bar": 0.96, "seeds": dict(prior)}
    for s in seeds:
        if str(s) in prior:
            v = prior[str(s)]
            print(f"seed {s}: cached (independent "
                  f"{v['independent_final_success']:.3f})", flush=True)
            continue
        d = SEED_DIRS[s]
        curve = np.load(os.path.join(ROOT, d, CURVE))
        succ, steps = run_eval(d)
        study["seeds"][str(s)] = {
            "online_final": round(float(curve[-1]), 4),
            "online_max": round(float(curve.max()), 4),
            "independent_final_success": succ,
            "independent_final_steps": steps,
            "n_evals": int(len(curve)),
        }
        print(f"seed {s}: online final {curve[-1]:.3f} (max {curve.max():.3f})"
              f" | independent {succ:.3f} success, {steps:.1f} steps",
              flush=True)
        _write(study)   # incremental: a crash never loses finished evals
    if do_boards:
        study["zero_shot_seed12"] = {}
        for w, l in ((45, 90), (60, 120)):
            succ, steps = run_eval(SEED_DIRS[12],
                                   (f"--width={w}", f"--length={l}"))
            study["zero_shot_seed12"][f"{w}x{l}"] = {
                "success": succ, "steps": steps, "n_tasks": 100}
            print(f"zero-shot {w}x{l}: {succ:.3f} success, {steps:.1f} steps",
                  flush=True)
    _write(study)
    print("wrote", OUT)


def _write(study):
    finals = [v["independent_final_success"] for v in study["seeds"].values()]
    study["summary"] = {
        "n_seeds": len(finals),
        "n_independent_ge_0.96": int(sum(f >= 0.96 for f in finals)),
        "independent_finals": sorted(finals),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(study, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
