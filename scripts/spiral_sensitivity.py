#!/usr/bin/env python
"""Spiral-boundary sensitivity study (VERDICT round-2 item 5).

The NLP's start boundary is the end state of a GTO low-thrust spiral.
The reference obtains it from ``pydylan.phases.lowthrust_spiral``
(``cr3bp_...warmstart.py:109-112``); this framework substitutes a
tangential-thrust spiral integrated at f64 (``physics/cr3bp.py:166-207``,
pinned as ``_SPIRAL_END_PINNED``).  The steering law is a stand-in: a
systematic modelling error in the spiral end state would shift every
feasibility number coherently.

This script quantifies that risk: it re-grades the flagship samples with
the native f64 oracle under start-boundary perturbations of plausible
modelling-error size (+-1e-3 LU per position axis, +-1e-3 VU per
velocity axis, and combined random perturbations at several magnitudes)
and reports how the feasible ratio moves.

Writes ``benchmark_results/spiral_sensitivity.json`` progressively.

Usage:
  python scripts/spiral_sensitivity.py [--n 256] [--mbh 8] [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # native f64 oracle is host work

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP = "benchmark_results/round2_flagship_1024/gto_halo/generated_samples.npy"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--mbh", type=int, default=8)
    p.add_argument("--out", default="benchmark_results/spiral_sensitivity.json")
    args = p.parse_args(argv)

    from rdm_tpu.physics.oracle import _mission_constants, \
        evaluate_warmstarts_native

    S = np.load(FLAGSHIP).astype(np.float64)[: args.n]
    he, G = S[:, 0], S[:, 1:]
    se0, _l1x, _e_l1 = _mission_constants(6.48423370092)  # default start_bdry

    # perturbation set: per-axis bumps at the stated modelling-error
    # scale, plus random combined perturbations at 3 magnitudes
    cases = [("baseline", se0.copy())]
    for i, name in enumerate(["x", "y", "z", "vx", "vy", "vz"]):
        for sgn in (+1.0, -1.0):
            se = se0.copy()
            se[i] += sgn * 1e-3
            cases.append((f"{name}{'+' if sgn > 0 else '-'}1e-3", se))
    rs = np.random.RandomState(0)
    for mag in (1e-4, 1e-3, 3e-3):
        d = rs.standard_normal(6)
        d = d / np.linalg.norm(d) * mag
        se = se0.copy()
        se[:6] += d
        cases.append((f"random_{mag:g}", se))

    blob = {
        "flagship": FLAGSHIP, "n": int(len(G)),
        "oracle": f"native f64 LM-{args.iters} optimal + MBH-{args.mbh}",
        "spiral_end_baseline": se0.tolist(),
        "note": ("start boundary is the tangential-thrust spiral stand-in "
                 "(physics/cr3bp.py:166-207); rows show how the flagship "
                 "feasible ratio responds to boundary modelling error"),
        "cases": [],
    }
    if os.path.exists(args.out):
        try:
            blob["cases"] = json.load(open(args.out)).get("cases", [])
        except Exception:
            pass
    done = {c["case"] for c in blob["cases"]}

    for name, se in cases:
        if name in done:
            continue
        t0 = time.time()
        res = evaluate_warmstarts_native(
            G, he, max_iters=args.iters, solver_mode="optimal",
            mbh_rounds=args.mbh, spiral_end=se)
        feas = res["feasible"]
        row = {
            "case": name,
            "feasible_ratio": float(feas.mean()),
            "local_optimal_ratio": float(res["optimal"].mean()),
            "avg_final_mass_feasible":
                float(res["final_mass"][feas].mean()) if feas.any() else None,
            "wall_s": round(time.time() - t0, 1),
        }
        blob["cases"].append(row)
        print(f"[{time.strftime('%H:%M:%S')}] {name:14s} "
              f"feas {row['feasible_ratio']:.3f} "
              f"opt {row['local_optimal_ratio']:.3f} "
              f"({row['wall_s']:.0f}s)", flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out + ".tmp", "w") as f:
            json.dump(blob, f, indent=2)
        os.replace(args.out + ".tmp", args.out)

    base = next(c for c in blob["cases"] if c["case"] == "baseline")
    worst = max(blob["cases"],
                key=lambda c: abs(c["feasible_ratio"] - base["feasible_ratio"]))
    blob["summary"] = {
        "baseline_feasible": base["feasible_ratio"],
        "worst_case": worst["case"],
        "worst_feasible": worst["feasible_ratio"],
        "max_abs_shift": round(abs(worst["feasible_ratio"]
                                   - base["feasible_ratio"]), 4),
    }
    with open(args.out + ".tmp", "w") as f:
        json.dump(blob, f, indent=2)
    os.replace(args.out + ".tmp", args.out)
    print("summary:", json.dumps(blob["summary"]))


if __name__ == "__main__":
    main()
