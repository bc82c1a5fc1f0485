"""Sampler-configuration quality study on the physical benchmark.

Samples the flagship checkpoint under several sampler configurations
(PC/EM, PC + Langevin corrector, probability-flow ODE) and grades each
batch's warm-start feasibility with the TPU LM oracle.  The reference
never measured this (its benchmark is hardwired to PC/EM, corrector none,
``configs/train.yaml:31-39``); with the oracle on the accelerator each
configuration costs seconds, so the sampler choice becomes a measurable
design knob rather than a default.

Usage: python scripts/sampler_quality_study.py [run_dir] [n]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # Default to the shipped round-2 flagship; the recorded study in
    # BENCH_NOTES.md ran on the (now untracked) corrected-pipeline run
    # "Training Runs/2026.08.17_015546" — pass any run dir to reproduce.
    run_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "Training Runs/2026.08.17_184657"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from rdm_tpu.benchmark.common import LoadedModel, generate_raw_samples
    from rdm_tpu.benchmark.gto_halo import (GTOHaloBenchmarkConfig,
                                            GTOHaloBenchmarker)
    from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu

    configs = [
        ("pc_em w=0", dict(method="pc", predictor="euler_maruyama",
                           corrector="none"), 0.0),
        ("pc_em w=2", dict(method="pc", predictor="euler_maruyama",
                           corrector="none"), 2.0),
        ("pc_em w=5", dict(method="pc", predictor="euler_maruyama",
                           corrector="none"), 5.0),
        ("pc_em+langevin", dict(method="pc", predictor="euler_maruyama",
                                corrector="langevin"), 0.0),
        ("ode", dict(method="ode"), 0.0),
    ]

    bench = GTOHaloBenchmarker(GTOHaloBenchmarkConfig(
        model_path=run_dir, num_samples=n, batch_size=n,
        enable_physical_validation=False, output_dir="/tmp/sampler_study"))

    for name, overrides, weight in configs:
        for k, v in overrides.items():
            setattr(bench.lm.cfg.sampling, k, v)
        raw, times = generate_raw_samples(bench.lm, n, n,
                                          guidance_weight=weight)
        phys = bench._inverse_pipeline(raw)
        res = refine_warmstarts_tpu(phys[:, 1:].astype(np.float32),
                                    phys[:, 0].astype(np.float32))
        print(f"{name:18s} sampling {sum(times):6.2f}s  "
              f"feasible {res['feasible'].mean():.3f}  "
              f"optimal {res['optimal'].mean():.3f}  "
              f"median pos_err {np.median(res['pos_err']):.4f}")


if __name__ == "__main__":
    main()
