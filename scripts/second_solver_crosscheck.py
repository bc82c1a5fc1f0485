#!/usr/bin/env python
"""Solver-family robustness cross-check of the same-oracle headline table.

The budget sweep (``scripts/budget_sweep.py``) established that the
ordering  flagship >> reference samples ~ uniform floor  is invariant to
the GRADING BUDGET — but every cell used the same solver family (this
repo's Levenberg-Marquardt + mass ascent + monotonic basin hopping).
The reference's grader is SNOPT, an SQP
(``/root/reference/GTO_Halo_DM/data_generation_scripts/
cr3bp_earth_mission_simulator_boundary_diffusion_warmstart.py:116-127``),
so in principle the "reference samples grade no better than uniform"
conclusion could be an artifact of the LM family's basins of attraction
rather than of the samples.

This script closes that hole: it grades the SAME sample sets with
ALGORITHMICALLY DIFFERENT f64 solvers driving the IDENTICAL residual
(``rdm_tpu.native.residual_batch`` — the same C++ forward-backward
shooting residual the LM oracle minimises):

* ``trf``  — scipy ``least_squares(method='trf')``: a trust-region
  reflective solver (2-norm trust region + reflective bound handling —
  a different globalisation/step-control mechanism from LM's damping
  ladder);
* ``slsqp`` — scipy ``minimize(method='SLSQP')``: a genuine SQP (the
  same algorithm class as SNOPT) maximising terminal mass subject to the
  7 shooting equality constraints and the NLP box.

Both run cold and under the same monotonic-basin-hopping globalisation
(``rdm_tpu.physics.oracle._mbh_loop``) as the headline table.
Feasible = the solver converges below the same 1e-3 residual norm.

Jacobians are forward differences batched through ONE
``residual_batch`` call per Jacobian (h = 1e-6 * (|x_v| + 1), the same
FD scheme as the C++ oracle), so the scipy layer adds no numerics of
its own.

Results stream to ``benchmark_results/second_solver_crosscheck.json``
after every cell (resumable).

Usage:
    python scripts/second_solver_crosscheck.py [--solvers trf,slsqp]
        [--n_flagship 256] [--n_control 256] [--mbh 0,8]
        [--sets flagship_rdm_tpu,uniform_floor,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

# pure-CPU work; a wedged TPU tunnel must not stall the study
jax.config.update("jax_platforms", "cpu")

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from scipy.optimize import least_squares, minimize  # noqa: E402

_FEAS_TOL = 1e-3
_FD_STEP = 1e-6          # cr3bp_native.cpp: hstep = 1e-6 * (|g_v| + 1)


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    den = 1 + z * z / n
    centre = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (max(0.0, centre - half), min(1.0, centre + half))


class _Problem:
    """Per-sample residual + batched-FD Jacobian over the native f64
    residual, with the sample's halo family data precomputed once."""

    def __init__(self, spiral_end, seed, period, vstable):
        from rdm_tpu import native
        self._native = native
        self._sp = spiral_end
        self._hd1 = (seed[None], np.asarray([period]), vstable[None])
        self._hd67 = (np.repeat(seed[None], 67, 0),
                      np.repeat(np.asarray([period]), 67),
                      np.repeat(vstable[None], 67, 0))
        self.nfev = 0

    def fun(self, x):
        self.nfev += 1
        r = self._native.residual_batch(x[None], None, self._sp,
                                        halo_data=self._hd1, n_threads=1)[0]
        return r

    def jac(self, x):
        """Forward-difference Jacobian: 67 residuals in one batch call
        (row 0 = base point), h = 1e-6 * (|x_v| + 1) like the C++ FD."""
        h = _FD_STEP * (np.abs(x) + 1.0)
        pts = np.concatenate([x[None], x[None] + np.diag(h)])
        r = self._native.residual_batch(pts, None, self._sp,
                                        halo_data=self._hd67, n_threads=1)
        self.nfev += 67
        return (r[1:] - r[0]).T / h  # [7, 66]


def _box():
    from rdm_tpu.physics.oracle import nlp_box
    lo, hi = nlp_box()
    # interior margin: scipy 'trf' requires lo < x0 < hi strictly
    eps = 1e-9 * (hi - lo)
    return lo, hi, eps


def _result_dict(n):
    """Empty result arrays in oracle._grade's dict layout (so the cross
    -check can reuse oracle._mbh_loop unchanged)."""
    return {
        "feasible": np.zeros(n, bool), "optimal": np.zeros(n, bool),
        "inform": np.full(n, 13), "cost": np.full(n, 1e6),
        "pos_err": np.full(n, 1e6), "vel_err": np.full(n, 1e6),
        "refined": np.zeros((n, 66)), "final_mass": np.full(n, -1.0),
        "terminal_mass": np.full(n, -1.0), "iters": np.zeros(n, np.int64),
        "stationarity": np.full(n, 1e6), "opt_gain": np.full(n, 1e6),
    }


def _finish_lane(out, i, prob, x, nfev):
    r = prob.fun(x)
    cost = float(np.linalg.norm(r))
    mass = float(x[63])
    sane = np.isfinite(cost) and cost < 1e5 and 300.0 < mass < 1000.1
    out["refined"][i] = x
    out["cost"][i] = cost
    out["pos_err"][i] = float(np.linalg.norm(r[:3]))
    out["vel_err"][i] = float(np.linalg.norm(r[3:6]))
    out["final_mass"][i] = mass if sane else -1.0
    out["feasible"][i] = bool(sane and cost < _FEAS_TOL)
    # these solvers carry no mass-ascent certificate; inform 1 never fires
    out["inform"][i] = 3 if out["feasible"][i] else 13
    out["iters"][i] = nfev


def solve_trf(G, he, max_nfev=160):
    """Trust-region-reflective bounded least squares on the 7-residual."""
    from rdm_tpu import native
    from rdm_tpu.physics.oracle import _mission_constants

    sp, _, _ = _mission_constants(6.48423370092)
    seeds, periods, vstables = native._halo_arrays(he)
    lo, hi, eps = _box()
    out = _result_dict(len(G))
    for i in range(len(G)):
        prob = _Problem(sp, seeds[i], periods[i], vstables[i])
        x0 = np.clip(G[i], lo + eps, hi - eps)
        try:
            sol = least_squares(prob.fun, x0, jac=prob.jac, bounds=(lo, hi),
                                method="trf", x_scale="jac",
                                max_nfev=max_nfev)
            x = sol.x
        except Exception:
            x = x0
        _finish_lane(out, i, prob, x, prob.nfev)
    return out


def solve_slsqp(G, he, maxiter=80):
    """SQP (the reference grader's algorithm class): maximise terminal
    mass subject to the 7 equality constraints and the NLP box."""
    from rdm_tpu import native
    from rdm_tpu.physics.oracle import _mission_constants

    sp, _, _ = _mission_constants(6.48423370092)
    seeds, periods, vstables = native._halo_arrays(he)
    lo, hi, eps = _box()
    grad = np.zeros(66)
    grad[63] = -1.0 / 100.0   # maximise mass, scaled ~O(residual)
    out = _result_dict(len(G))
    for i in range(len(G)):
        prob = _Problem(sp, seeds[i], periods[i], vstables[i])
        x0 = np.clip(G[i], lo + eps, hi - eps)
        try:
            sol = minimize(
                lambda x: -x[63] / 100.0, x0, jac=lambda x: grad,
                method="SLSQP", bounds=list(zip(lo, hi)),
                constraints=[{"type": "eq", "fun": prob.fun,
                              "jac": prob.jac}],
                options={"maxiter": maxiter, "ftol": 1e-10})
            x = np.clip(sol.x, lo, hi)
        except Exception:
            x = x0
        _finish_lane(out, i, prob, x, prob.nfev)
    return out


_SOLVERS = {"trf": solve_trf, "slsqp": solve_slsqp}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--solvers", default="trf,slsqp")
    p.add_argument("--n_flagship", type=int, default=256)
    p.add_argument("--n_control", type=int, default=256)
    p.add_argument("--mbh", default="0,8")
    p.add_argument("--sets", default=None)
    p.add_argument("--out",
                   default="benchmark_results/second_solver_crosscheck.json")
    args = p.parse_args(argv)

    import budget_sweep as bs
    from rdm_tpu.physics.oracle import _mbh_loop, nlp_box

    sets = {}
    sets["flagship_rdm_tpu"] = np.load(bs.FLAGSHIP).astype(
        np.float64)[: args.n_flagship]
    for name, path in bs.REF_SETS.items():
        sets[name] = bs._load_reference_set(path)
    sets["uniform_floor"] = bs._uniform_floor(args.n_control)
    sets["gt_ceiling"] = bs._gt_ceiling(args.n_control)
    if args.sets:
        keep = set(args.sets.split(","))
        sets = {k: v for k, v in sets.items() if k in keep}

    blob = {
        "residual": "rdm_tpu.native residual_batch — the identical f64 "
                    "forward-backward shooting residual the LM oracle "
                    "minimises; feasible = converged below 1e-3",
        "solvers": {
            "trf": "scipy least_squares method=trf (trust-region "
                   "reflective, bounded), batched-FD Jacobian",
            "slsqp": "scipy minimize method=SLSQP (SQP, SNOPT's "
                     "algorithm class): max mass s.t. 7 eq constraints "
                     "+ box",
        },
        "mbh": "rdm_tpu.physics.oracle._mbh_loop, sigma=0.05 — the same "
               "globalisation as the headline table",
        "cells": [],
    }
    if os.path.exists(args.out):
        try:
            blob["cells"] = json.load(open(args.out)).get("cells", [])
        except Exception:
            pass
    done = {(c["solver"], c["set"], c["mbh_rounds"]) for c in blob["cells"]}

    lo, hi = nlp_box()
    mbh_grid = [int(m) for m in args.mbh.split(",")]
    for solver in args.solvers.split(","):
        fn = _SOLVERS[solver]
        for mbh in mbh_grid:
            for name, s in sets.items():
                if (solver, name, mbh) in done:
                    continue
                he, G = s[:, 0], s[:, 1:]
                t0 = time.time()
                if mbh > 0:
                    res = _mbh_loop(fn, G, he, mbh, 0.05, 0, lo, hi)
                else:
                    res = fn(G, he)
                dt = time.time() - t0
                k, n = int(res["feasible"].sum()), len(G)
                ci = wilson_ci(k, n)
                cell = {
                    "solver": solver, "set": name, "n": n,
                    "mbh_rounds": mbh,
                    "feasible_ratio": round(k / n, 4),
                    "feasible_ci95": [round(ci[0], 4), round(ci[1], 4)],
                    "median_cost": round(float(np.median(res["cost"])), 5),
                    "avg_final_mass_feasible": (
                        round(float(res["final_mass"][res["feasible"]].mean()), 2)
                        if k else None),
                    "wall_s": round(dt, 1),
                }
                blob["cells"].append(cell)
                print(cell, flush=True)
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    json.dump(blob, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
