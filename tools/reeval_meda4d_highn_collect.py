"""Collect the 500-task high-n re-evals (/tmp/highn_s<seed>.log, written by
tools/reeval_meda4d_highn.sh) into artifacts/meda4d_seed_study.json under
each seed's ``independent_500`` key."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import re

OUT = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "artifacts", "meda4d_seed_study.json")

with open(OUT) as f:
    study = json.load(f)
for s in list(study["seeds"]):
    log = f"/tmp/highn_s{s}.log"
    if not _os.path.exists(log):
        continue
    text = open(log).read()
    m = re.search(r"successful rate is: ([\d.]+)", text)
    st = re.search(r"total_steps is: ([\d.]+)", text)
    if not m:
        print(f"seed {s}: no result in {log}")
        continue
    study["seeds"][s]["independent_500"] = {
        "success": float(m.group(1)), "steps": float(st.group(1)),
        "n_tasks": 500}
    print(f"seed {s}: 500-task success {m.group(1)}")
f500 = [v["independent_500"]["success"] for v in study["seeds"].values()
        if "independent_500" in v]
if f500:
    study["summary"]["independent_500_finals"] = sorted(f500)
    study["summary"]["n_500_ge_0.96"] = int(sum(x >= 0.96 for x in f500))
with open(OUT, "w") as f:
    json.dump(study, f, indent=1, sort_keys=True)
print("updated", OUT)
