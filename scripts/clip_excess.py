"""Quantify the spherical-conversion clip excess (BENCH_NOTES "ODE/PC
clip study"): regenerate the pc250 artifact's sample stream
(seed-deterministic), reconstruct the PRE-clip cartesian control
magnitudes, and report how far the clipped triples exceed 1.

The stored benchmark artifacts are post-clip (r <= 1 by construction,
``gto_halo.py:151-156``), so the excess must be measured upstream of
the inverse pipeline.  Measured (pc250 stream, n=1024): 10.4% of
triples clip, median excess 0.014, p90 0.036, max 0.092 — the
generative tail around the training data's |u| ~ 1 thrust-arc mass.

Usage: python scripts/clip_excess.py [run_dir] [steps] [n]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "Training Runs/2026.08.17_184657"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from rdm_tpu.benchmark.gto_halo import (GTOHaloBenchmarkConfig,
                                            GTOHaloBenchmarker)
    from rdm_tpu.benchmark.common import generate_raw_samples
    from rdm_tpu.sde import RVESDE

    bench = GTOHaloBenchmarker(GTOHaloBenchmarkConfig(
        model_path=run_dir, num_samples=n, batch_size=n,
        enable_physical_validation=False, output_dir="/tmp/clip_excess"))
    cfg = bench.lm.cfg
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, steps)
    raw, _ = generate_raw_samples(bench.lm, n, n, sde_override=sde, seed=0)

    out = raw[:, 1:].astype(np.float64)
    out = out * float(cfg.data.get("gto_std", 1)) \
        + float(cfg.data.get("gto_mean", 0))
    ctrl = (out[:, 3:-3] * 2 - 1).reshape(-1, 20, 3)
    u = np.sqrt((ctrl ** 2).sum(-1))
    exc = u[u > 1] - 1
    print(f"triples: {u.size}, clipped: {(u > 1).sum()} "
          f"({100 * (u > 1).mean():.2f}%)")
    if exc.size:
        print(f"excess over 1: median {np.median(exc):.4f}, "
              f"p90 {np.percentile(exc, 90):.4f}, max {exc.max():.4f}")
    print(f"|u|: median {np.median(u):.3f}, p90 {np.percentile(u, 90):.3f}")


if __name__ == "__main__":
    main()
