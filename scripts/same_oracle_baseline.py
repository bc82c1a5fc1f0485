#!/usr/bin/env python
"""Same-oracle comparison (VERDICT round-1 item 3): grade the REFERENCE
model's checked-in generated samples and THIS framework's samples with
the SAME physical oracle, so the feasibility numbers share a grader.

Reference samples: ``/root/reference/Benchmark/benchmark_results/
gto_halo_50samples_16workers_results/samples.npy`` — 50 physical-unit
67-vectors emitted by the reference's diffusion model, published with
SNOPT-graded feasible_ratio 0.86 (its summary.txt; the headline
BASELINE.md runs report 0.50-0.54 on other sample sets whose raw samples
are not checked in).  The halo-period slot arrives in TU and is
re-normalised by the halo orbit period before grading
(``prepare_training_data.py:92`` semantics).

Our samples: drawn from a trained run directory via the benchmark's
exact sampling + inverse pipeline (GTOHaloBenchmarker.generate_samples).

Both sets are graded by the SAME local solve: LM + mass ascent +
monotonic basin hopping (the oracle stack of rdm_tpu.physics), f64
native backend by default.

Output: one table + a JSON blob on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SAMPLES = ("/root/reference/Benchmark/benchmark_results/"
               "gto_halo_50samples_16workers_results/samples.npy")


def grade(samples67: np.ndarray, label: str, args):
    """samples67: [N, 67] physical units, halo-period slot ALREADY a
    normalised orbit-phase fraction in [0, 1]."""
    he = samples67[:, 0].astype(np.float64)
    G = samples67[:, 1:].astype(np.float64)
    if args.backend == "tpu":
        from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu
        res = refine_warmstarts_tpu(
            G, he, max_iters=args.max_iters, solver_mode=args.solver_mode,
            mbh_rounds=args.mbh_rounds)
    else:
        from rdm_tpu.physics.oracle import evaluate_warmstarts_native
        res = evaluate_warmstarts_native(
            G, he, max_iters=args.max_iters, solver_mode=args.solver_mode,
            mbh_rounds=args.mbh_rounds)
    feas = res["feasible"]
    row = {
        "samples": label,
        "n": int(len(G)),
        "feasible_ratio": float(feas.mean()),
        "local_optimal_ratio": float(res["optimal"].mean()),
        "avg_final_mass_feasible":
            float(res["final_mass"][feas].mean()) if feas.any() else None,
    }
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None,
                   help="trained run dir for THIS framework's row; omit to "
                        "grade only the reference samples")
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--guidance_weight", type=float, default=0.0)
    p.add_argument("--backend", default="native", choices=["native", "tpu"])
    p.add_argument("--solver_mode", default="optimal",
                   choices=["feasible", "optimal"])
    p.add_argument("--max_iters", type=int, default=30)
    p.add_argument("--mbh_rounds", type=int, default=8)
    p.add_argument("--ref_samples", default=REF_SAMPLES)
    p.add_argument("--out", default=None, help="write the JSON here too")
    args = p.parse_args(argv)

    rows = []

    # ---- reference model's samples, graded by OUR oracle --------------
    s = np.load(args.ref_samples).astype(np.float64)
    from rdm_tpu.datagen import get_halo_period
    s = s.copy()
    s[:, -2] = s[:, -2] / np.array(
        [get_halo_period(float(h)) for h in s[:, 0]])  # TU -> phase frac
    rows.append(grade(s, "reference model (checked-in samples.npy)", args))

    # ---- this framework's samples, graded by the SAME oracle ----------
    if args.model_path:
        from rdm_tpu.benchmark.gto_halo import (GTOHaloBenchmarker,
                                                GTOHaloBenchmarkConfig)
        cfg = GTOHaloBenchmarkConfig(
            model_path=args.model_path, num_samples=args.num_samples,
            batch_size=min(args.num_samples, 512),
            guidance_weight=args.guidance_weight,
            enable_physical_validation=False,
            output_dir="/tmp/same_oracle_bench", save_samples=False,
            save_plots=False)
        b = GTOHaloBenchmarker(cfg)
        samples = np.asarray(b.generate_samples())
        rows.append(grade(samples, f"rdm_tpu model ({args.model_path})",
                          args))

    # ---- context row: the reference's own SNOPT grading ---------------
    context = {
        "samples": "reference model, graded by reference SNOPT "
                   "(its own summary.txt; NOT the same oracle)",
        "n": 50, "feasible_ratio": 0.86, "local_optimal_ratio": 0.86,
        "avg_final_mass_feasible": None,
    }

    oracle = (f"{args.backend} LM, solver_mode={args.solver_mode}, "
              f"max_iters={args.max_iters}, mbh_rounds={args.mbh_rounds}")
    print(f"\nSAME-ORACLE BASELINE (oracle: {oracle})")
    print("-" * 78)
    for r in rows:
        m = (f"{r['avg_final_mass_feasible']:.1f}"
             if r["avg_final_mass_feasible"] else "n/a")
        print(f"{r['samples'][:52]:52s} n={r['n']:<5d} "
              f"feas {r['feasible_ratio']:.2f} opt "
              f"{r['local_optimal_ratio']:.2f} mass {m}")
    print("-" * 78)
    print(f"{context['samples'][:52]:52s} n=50    feas 0.86 opt 0.86 "
          f"(context only)")

    blob = {"oracle": oracle, "rows": rows, "context": context}
    print(json.dumps(blob))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(blob, f, indent=2)


if __name__ == "__main__":
    main()
