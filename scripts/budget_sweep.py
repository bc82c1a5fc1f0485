#!/usr/bin/env python
"""Grader-budget robustness study (VERDICT round-2 items 1 and 7).

The round-2 same-oracle table graded every sample set at ONE solver
budget (LM max_iters=30, mbh_rounds=8).  The reference's own grader is
SNOPT with a 15,000-iteration budget under monotonic basin hopping
(``/root/reference/GTO_Halo_DM/data_generation_scripts/
cr3bp_earth_mission_simulator_boundary_diffusion_warmstart.py:120,176``),
so a single small budget risks conflating sample quality with
train/grade-oracle alignment.  This script grades EVERY available sample
set across a budget grid with the native f64 oracle and reports
feasibility-vs-budget curves, so the headline comparison is
budget-invariant:

  * sets: this framework's flagship samples (n=1024), every checked-in
    reference sample artifact (3 sets: n=50, n=50, n=8), a uniform-guess
    floor, and a ground-truth round-trip ceiling;
  * grid: max_iters in {30, 100, 300} x mbh_rounds in {0, 8, 32}.

All rows use the SAME grader: the native f64 Levenberg-Marquardt local
solve with mass ascent (solver_mode=optimal) and monotonic basin hopping
(``rdm_tpu.physics.oracle.evaluate_warmstarts_native``) — feasibility =
the local solver converges from (a perturbation of) the warm start,
exactly the semantics the reference gets from warm-started SNOPT.

Results are written progressively to
``benchmark_results/budget_sweep.json`` after every cell, so a partial
run still leaves a usable artifact.

Usage:
  python scripts/budget_sweep.py [--n_flagship 1024] [--n_control 256]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

# The native f64 oracle is pure-CPU work; pin jax to the host platform so
# a wedged/absent TPU tunnel cannot stall the sweep (the environment's
# sitecustomize pins jax_platforms to the TPU plugin, so the env var
# alone is too late — see tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference/Benchmark/benchmark_results"
REF_SETS = {
    # every checked-in reference sample artifact (VERDICT item 7):
    "ref_50samples_16workers": f"{REF_ROOT}/gto_halo_50samples_16workers_results/samples.npy",
    "ref_fast_20250804": f"{REF_ROOT}/gto_halo_fast_results_20250804_004930/samples.npy",
    "ref_8samples_8workers": f"{REF_ROOT}/gto_halo_8samples_8workers_results/samples.npy",
}
FLAGSHIP = "benchmark_results/round2_flagship_1024/gto_halo/generated_samples.npy"
GT_PKL = "datasets/training_data_boundary_80073.pkl"

ITER_GRID = (30, 100, 300)
MBH_GRID = (0, 8, 32)


def _load_reference_set(path: str) -> np.ndarray:
    """Reference samples.npy: [N, 67] physical units with the halo-period
    slot in TU; re-normalise it to an orbit-phase fraction
    (``prepare_training_data.py:92`` semantics) before grading."""
    from rdm_tpu.datagen import get_halo_period

    s = np.load(path).astype(np.float64)
    s[:, -2] = s[:, -2] / np.array([get_halo_period(float(h)) for h in s[:, 0]])
    return s


def _uniform_floor(n: int, seed: int = 0) -> np.ndarray:
    """Uniform warm-start guesses in physical units — the distribution of
    ``CR3BPInitGenerator.uniform_sample`` (reference
    ``cr3bp_init_generator_boundary.py:54-97``), vectorised."""
    rs = np.random.RandomState(seed)
    he = rs.uniform(0.008, 0.095, n)
    t_shoot = rs.uniform(0.0, 40.0, (n, 1))
    t_init = rs.uniform(0.0, 15.0, (n, 1))
    t_final = rs.uniform(0.0, 15.0, (n, 1))
    theta = rs.uniform(0, 2 * np.pi, (n, 20))
    psi = rs.uniform(0, 2 * np.pi, (n, 20))
    r = rs.uniform(0, 1, (n, 20))
    ctrl = np.stack([theta, psi, r], -1).reshape(n, 60)
    mass = rs.uniform(408.0, 470.0, (n, 1))
    manifold_start = rs.uniform(0, 1, (n, 1))
    manifold_len = rs.uniform(5.0, 11.0, (n, 1))
    G = np.concatenate([t_shoot, t_init, t_final, ctrl,
                        mass, manifold_start, manifold_len], axis=1)
    return np.concatenate([he[:, None], G], axis=1)


def _gt_ceiling(n: int) -> np.ndarray:
    """Ground-truth training rows pushed through the benchmark's inverse
    pipeline (normalised [0,1] rows -> physical-unit warm starts) — the
    feasible ratio a perfect generative model would score."""
    rows = np.asarray(pickle.load(open(GT_PKL, "rb")))[:n]
    alpha_phys = rows[:, 0] * (0.095 - 0.008) + 0.008
    out = rows[:, 1:].astype(np.float64)
    out[:, 0] *= 40.0
    out[:, 1] *= 15.0
    out[:, 2] *= 15.0
    ctrl = (out[:, 3:-3] * 2 - 1).reshape(-1, 20, 3)
    u = np.sqrt((ctrl ** 2).sum(-1))
    theta = np.zeros_like(u)
    nz = u != 0
    theta[nz] = np.arcsin(np.clip(ctrl[:, :, 2][nz] / u[nz], -1, 1))
    alpha = np.arctan2(ctrl[:, :, 1], ctrl[:, :, 0])
    alpha = np.where(alpha >= 0, alpha, 2 * np.pi + alpha)
    theta = np.where(theta >= 0, theta, 2 * np.pi + theta)
    u = np.minimum(u, 1.0)
    out[:, 3:63] = np.stack([alpha, theta, u], -1).reshape(-1, 60)
    out[:, -3] = out[:, -3] * (470 - 408) + 408
    out[:, -1] = out[:, -1] * (11 - 5) + 5
    return np.concatenate([alpha_phys[:, None], out], axis=1)


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion."""
    p = k / n
    den = 1 + z * z / n
    centre = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return [round(max(0.0, centre - half), 4),
            round(min(1.0, centre + half), 4)]


def annotate_cis(path: str):
    """Add 95% Wilson CIs to every cell of an existing artifact (k is
    recovered exactly from ratio * n)."""
    blob = json.load(open(path))
    for c in blob["cells"]:
        k = int(round(c["feasible_ratio"] * c["n"]))
        c["feasible_ci95"] = wilson_ci(k, c["n"])
    blob["ci_note"] = ("feasible_ci95 = 95% Wilson score interval on "
                       "feasible_ratio at the cell's n")
    with open(path + ".tmp", "w") as f:
        json.dump(blob, f, indent=2)
    os.replace(path + ".tmp", path)
    print(f"annotated {sum(1 for _ in blob['cells'])} cells in {path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotate_cis", action="store_true",
                   help="only (re)compute feasible_ci95 on the existing "
                        "artifact and exit — no grading")
    p.add_argument("--n_flagship", type=int, default=1024)
    p.add_argument("--n_control", type=int, default=256,
                   help="n for the uniform floor and GT ceiling rows")
    p.add_argument("--out", default="benchmark_results/budget_sweep.json")
    p.add_argument("--sets", default=None,
                   help="comma-separated subset of set names to run")
    p.add_argument("--extra_set", action="append", default=[],
                   metavar="NAME=PATH",
                   help="additional sample set(s) to grade: a .npy of "
                        "physical-unit [N, 67] vectors as written by the "
                        "benchmark inverse pipeline (e.g. an ODE-sampler "
                        "artifact's generated_samples.npy); repeatable")
    p.add_argument("--n_extra", type=int, default=None,
                   help="cap the row count of every --extra_set")
    args = p.parse_args(argv)

    if args.annotate_cis:
        annotate_cis(args.out)
        return

    from rdm_tpu.physics.oracle import evaluate_warmstarts_native

    sets = {}
    sets["flagship_rdm_tpu"] = np.load(FLAGSHIP).astype(np.float64)[: args.n_flagship]
    for name, path in REF_SETS.items():
        sets[name] = _load_reference_set(path)
    sets["uniform_floor"] = _uniform_floor(args.n_control)
    sets["gt_ceiling"] = _gt_ceiling(args.n_control)
    for spec in args.extra_set:
        name, path = spec.split("=", 1)
        s = np.load(path).astype(np.float64)
        sets[name] = s[: args.n_extra] if args.n_extra else s
    if args.sets:
        keep = set(args.sets.split(","))
        sets = {k: v for k, v in sets.items() if k in keep}

    blob = {
        "oracle": "native f64 LM + mass ascent (solver_mode=optimal) + "
                  "monotonic basin hopping; feasible = local solve "
                  "converges below 1e-3 residual",
        "grid": {"max_iters": list(ITER_GRID), "mbh_rounds": list(MBH_GRID)},
        "context": {
            "reference_snopt_budget": "SNOPT total_iteration_limit=15000 "
                                      "under MBH (cr3bp_earth_mission_simulator_"
                                      "boundary_diffusion_warmstart.py:120,176)",
            "reference_snopt_self_grade": {
                "ref_50samples_16workers": 0.86,
                "note": "the reference's own summary.txt for that sample "
                        "set; different grader, context only"},
        },
        "cells": [],
    }
    if os.path.exists(args.out):  # resume: keep prior cells
        try:
            prior = json.load(open(args.out))
            blob["cells"] = prior.get("cells", [])
        except Exception:
            pass
    # a cell is done only if it was graded at >= the requested n — asking
    # for a larger n (e.g. tightening the uniform floor's CI to n=1024)
    # re-grades and replaces the smaller-n cell
    done = {}
    for c in blob["cells"]:
        k = (c["set"], c["max_iters"], c["mbh_rounds"])
        done[k] = max(done.get(k, 0), c["n"])

    # cheapest cells first so partial runs cover the whole grid coarsely
    cells = sorted(
        ((it, mbh) for it in ITER_GRID for mbh in MBH_GRID),
        key=lambda c: c[0] * (1 + c[1]))
    for it, mbh in cells:
        for name, s in sets.items():
            if done.get((name, it, mbh), 0) >= len(s):
                continue
            blob["cells"] = [c for c in blob["cells"]
                             if (c["set"], c["max_iters"], c["mbh_rounds"])
                             != (name, it, mbh)]
            he, G = s[:, 0], s[:, 1:]
            t0 = time.time()
            res = evaluate_warmstarts_native(
                G, he, max_iters=it, solver_mode="optimal", mbh_rounds=mbh)
            dt = time.time() - t0
            feas = res["feasible"]
            cell = {
                "set": name, "n": int(len(G)),
                "max_iters": it, "mbh_rounds": mbh,
                "feasible_ratio": float(feas.mean()),
                "feasible_ci95": wilson_ci(int(feas.sum()), len(G)),
                "local_optimal_ratio": float(res["optimal"].mean()),
                "avg_final_mass_feasible":
                    float(res["final_mass"][feas].mean()) if feas.any() else None,
                "wall_s": round(dt, 1),
            }
            blob["cells"].append(cell)
            print(f"[{time.strftime('%H:%M:%S')}] {name:28s} iters={it:<4d} "
                  f"mbh={mbh:<3d} n={cell['n']:<5d} "
                  f"feas {cell['feasible_ratio']:.3f} "
                  f"opt {cell['local_optimal_ratio']:.3f} ({dt:.0f}s)",
                  flush=True)
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out + ".tmp", "w") as f:
                json.dump(blob, f, indent=2)
            os.replace(args.out + ".tmp", args.out)
    print("sweep complete:", args.out)


if __name__ == "__main__":
    main()
