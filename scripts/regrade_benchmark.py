"""Regrade a checked-in benchmark artifact's physical validation in place.

A benchmark result dir (``<dir>/gto_halo/``) stores the physically
un-normalised samples (``generated_samples.npy``) alongside the metrics
computed at grading time.  When the grading oracle improves — e.g. the
round-3 df32 mixed-precision solver closing the f32-vs-f64 gap
(BENCH_NOTES.md "f32 vs f64 grading") — old artifacts keep stale
feasibility numbers.  This tool re-runs ONLY the physical-validation
stage on the stored samples with the current oracle configuration and
rewrites ``gto_halo_results.json`` + ``summary.txt``, recording the
regrade provenance (previous numbers are kept under
``physical_validation_pre_regrade``).

Usage:
    python scripts/regrade_benchmark.py benchmark_results/round2_flagship_1024 \
        [--oracle_backend tpu] [--oracle_precision df32] [--mbh_rounds 8] \
        [--max_iters 30] [--solver_mode optimal]

Reference context: the reference never regrades (every SNOPT solve is
~17-20 s so its artifacts are graded once,
``Benchmark/gto_halo_benchmarking.py:425-531``); at ~0.1 s/sample on the
TPU regrading a 1024-sample artifact is a two-minute operation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdm_tpu.benchmark.gto_halo import (GTOHaloBenchmarkConfig,
                                        GTOHaloBenchmarker)


def regrade(result_dir: str, *, oracle_backend: str, oracle_precision: str,
            mbh_rounds: int, max_iters: int, solver_mode: str) -> dict:
    gto_dir = os.path.join(result_dir, "gto_halo")
    samples_path = os.path.join(gto_dir, "generated_samples.npy")
    results_path = os.path.join(gto_dir, "gto_halo_results.json")
    samples = np.load(samples_path)
    with open(results_path) as f:
        results = json.load(f)

    # Build a benchmarker shell around the stored samples: the grading
    # path only consults .config (no model load needed).
    bench = GTOHaloBenchmarker.__new__(GTOHaloBenchmarker)
    bench.config = GTOHaloBenchmarkConfig(
        model_path="<regrade>", output_dir=gto_dir,
        oracle_backend=oracle_backend, oracle_precision=oracle_precision,
        oracle_mbh_rounds=mbh_rounds, oracle_max_iters=max_iters,
        solver_mode=solver_mode, num_samples=len(samples),
        batch_size=len(samples))
    bench.total_spherical_clips = 0
    bench.total_spherical_elements = 0

    old = results.get("physical_validation")
    new = bench.compute_physical_validation_metrics(samples)
    new["regraded_from"] = {
        "oracle_backend": (old or {}).get("oracle_backend"),
        "oracle_grading_precision": (old or {}).get(
            "oracle_grading_precision", "f32"),
        "feasible_ratio": (old or {}).get("feasible_ratio"),
        "local_optimal_ratio": (old or {}).get("local_optimal_ratio"),
    }
    results["physical_validation_pre_regrade"] = old
    results["physical_validation"] = new

    with open(results_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    # summary.txt in the save_results format (physical_validation section
    # reflects the regrade; pre-regrade numbers stay in the JSON only)
    lines = ["=" * 60, "GTO HALO BENCHMARK RESULTS", "=" * 60, ""]
    for section, vals in results.items():
        if section == "physical_validation_pre_regrade":
            continue
        lines.append(f"{section.upper()}:")
        if isinstance(vals, dict):
            for k, v in vals.items():
                lines.append(f"  {k}: {v}")
        lines.append("")
    with open(os.path.join(gto_dir, "summary.txt"), "w") as f:
        f.write("\n".join(lines))
    print(f"{result_dir}: feasible {new['feasible_ratio']:.4f} "
          f"(was {(old or {}).get('feasible_ratio')}), optimal "
          f"{new['local_optimal_ratio']:.4f} "
          f"[{oracle_backend}/{oracle_precision}, LM-{max_iters}, "
          f"MBH-{mbh_rounds}]")
    return new


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("result_dirs", nargs="+")
    p.add_argument("--oracle_backend", default="tpu")
    p.add_argument("--oracle_precision", default="df32")
    p.add_argument("--mbh_rounds", type=int, default=8)
    p.add_argument("--max_iters", type=int, default=30)
    p.add_argument("--solver_mode", default="optimal")
    args = p.parse_args()
    for d in args.result_dirs:
        regrade(d, oracle_backend=args.oracle_backend,
                oracle_precision=args.oracle_precision,
                mbh_rounds=args.mbh_rounds, max_iters=args.max_iters,
                solver_mode=args.solver_mode)


if __name__ == "__main__":
    main()
