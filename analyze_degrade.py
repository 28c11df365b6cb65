"""Degradation-sweep wear analysis: put numbers behind the success-rate
trajectories (RESULTS.md "Degradation sweeps").

Reads the committed ``DegreData/<cfg>/{success,steps,health}.npy`` arrays
(ours under ``artifacts/DegreData``, the reference's under
``/root/reference/DegreData``) and derives per-epoch wear statistics from
the health snapshots:

* **decayed cells** — cells whose health dropped since the previous epoch,
  i.e. cells that crossed the 50-actuation threshold and were multiplied by
  their degrade factor (reference ``updateHealth``, env/DMFB/dmfb.py:465-471);
* **mean health** over the board;
* **actuations/epoch** — ``drop_num x mean_steps x evaluate_task`` (each
  executed step actuates exactly one cell per droplet, ``addUsage``,
  dmfb.py:459-463; failed episodes count as the step limit, matching how
  steps.npy is recorded).

The wear->failure feedback loop this quantifies: lower policy efficiency ->
more steps/episode -> more actuations -> more threshold crossings -> lower
health -> stochastic move failures -> even more steps.  A policy efficient
enough keeps actuations/epoch low and the loop never ignites.

Usage:
    python analyze_degrade.py [cfg ...]   # default: the three reference cfgs
"""

import os
import sys

import numpy as np

OURS = "artifacts/DegreData"
REF = "/root/reference/DegreData"

# evaluate_task per the sweep protocol (reference README.md:17)
EVAL_TASKS = 20


def wear_stats(path: str, drop_num: int):
    """Per-epoch wear table for one sweep directory.

    Actuations per epoch come from the RECORDED per-cell usage counters
    when the sweep saved them (``usage.npy``, our eva_degrade.py:119-120;
    the reference never recorded usage): the counter resets to 0 whenever
    a cell crosses the 50-actuation decay threshold (update_health,
    envs/dmfb.py:377-384), so the measured value is
    ``delta(usage) + 50 x decay_events`` — a tight lower bound (each decay
    event loses the >=50 counter it reset).  Sweeps without usage.npy fall
    back to the ``drop_num x steps x tasks`` formula (exact for DMFB,
    where each droplet actuates exactly one cell per executed step —
    addUsage, reference dmfb.py:459-463; for MEDA multiply by the 5x5
    footprint)."""
    steps = np.load(os.path.join(path, "steps.npy"))    # (5, E)
    success = np.load(os.path.join(path, "success.npy"))
    runs, E = steps.shape
    hpath = os.path.join(path, "health.npy")
    if os.path.exists(hpath):
        health = np.load(hpath)                         # (5, E, W, L)
        W, L = health.shape[-2:]
        # cells that decayed between snapshots (threshold crossings)
        dh = health[:, 1:] < health[:, :-1] - 1e-9
        decayed = dh.reshape(runs, E - 1, -1).sum(-1)   # (5, E-1)
        cum_decay_events = np.cumsum(decayed, axis=1)
        mean_health = health.reshape(runs, E, -1).mean(-1)
    else:  # the reference's 50by50-4d0b sweep shipped without health.npy
        W = L = 0
        decayed = np.full((runs, max(E - 1, 1)), np.nan)
        cum_decay_events = decayed
        mean_health = np.full((runs, E), np.nan)
    actuations = drop_num * steps * EVAL_TASKS          # (5, E) formula
    measured = None
    upath = os.path.join(path, "usage.npy")
    if os.path.exists(upath) and W:
        usage = np.load(upath)                          # (5, E, W, L)
        du = (usage[:, 1:] - usage[:, :-1]).reshape(runs, E - 1, -1).sum(-1)
        measured = du + 50.0 * decayed                  # (5, E-1) lower bound
    return {
        "success": success.mean(0),
        "steps": steps.mean(0),
        "actuations": actuations.mean(0),
        # measured actuations cover epoch INTERVALS (E-1); index e-1 is the
        # work done between snapshots e-1 and e
        "measured": None if measured is None else measured.mean(0),
        "decayed": decayed.mean(0),            # per-epoch crossings (E-1)
        "cum_decay": cum_decay_events.mean(0),
        "mean_health": mean_health.mean(0),
        "cells": W * L,
    }


def row(label, s, epochs, which="formula"):
    """``which='measured'`` uses the usage-derived actuation count (the
    true wear; only NOT-yet-done droplets actuate, addUsage
    dmfb.py:459-463, so the formula over-counts by the finished-droplet
    share — measured runs ~2x lower).  The formula column stays for
    comparison against the reference, whose sweeps recorded no usage."""
    out = [label]
    for e in epochs:
        if e == 0:
            dec = 0.0
        else:
            dec = s["cum_decay"][min(e - 1, len(s["cum_decay"]) - 1)]
        if which == "measured" and s["measured"] is not None and e > 0:
            act = s["measured"][min(e - 1, len(s["measured"]) - 1)]
        else:
            act = s["actuations"][e]
        out.append(
            f"{s['success'][e]:.2f}/{s['steps'][e]:.0f}"
            f"/{act:.0f}/{dec:.0f}/{s['mean_health'][e]:.3f}"
        )
    return out


def main(cfgs):
    for cfg, drop in cfgs:
        print(f"\n=== {cfg} (success/steps/actuations/cumDecayedCells/"
              f"meanHealth at epoch) ===")
        for label, root in [("ours", OURS), ("reference", REF)]:
            path = os.path.join(root, cfg)
            if not os.path.isdir(path):
                print(f"  {label}: (no sweep at {path})")
                continue
            s = wear_stats(path, drop)
            E = len(s["success"])
            epochs = sorted({0, 1, E // 4, E // 2, 3 * E // 4, E - 1})
            hdr = "  ".join(f"e{e}" for e in epochs)
            print(f"  {label} [{hdr}] ({s['cells']} cells)")
            print("   " + "  ".join(row(label, s, epochs)[1:]))
            if s["measured"] is not None:
                print("   measured: "
                      + "  ".join(row(label, s, epochs, "measured")[1:]))
        # control sweeps (ours only), e.g. 50by50-4d0b-eps0.3
        base = os.path.join(OURS)
        for d in sorted(os.listdir(base)):
            if d.startswith(cfg + "-eps"):
                s = wear_stats(os.path.join(base, d), drop)
                E = len(s["success"])
                epochs = sorted({0, 1, E // 4, E // 2, 3 * E // 4, E - 1})
                print(f"  ours control {d.split(cfg + '-')[1]}")
                print("   " + "  ".join(row(d, s, epochs)[1:]))
                if s["measured"] is not None:
                    print("   measured: "
                          + "  ".join(row(d, s, epochs, "measured")[1:]))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        import re

        cfgs = [(c, int(re.search(r"-(\d+)d", c).group(1)))
                for c in sys.argv[1:]]
    else:
        cfgs = [("50by50-4d0b", 4), ("50by50-10d0b", 10), ("20by20-10d0b", 10)]
    main(cfgs)
