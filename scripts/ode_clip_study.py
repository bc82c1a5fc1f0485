"""Why does the ODE sampler clip ~9.6% of control triples at |u| > 1?

Round-4 recorded the number (BENCH_NOTES) but not its origin: the PC
sampler clips ~0% on the same weights, so the excess face mass is a
property of the probability-flow path — either the mollifier ``bump``
(which kills the reverse drift near the cube faces, so mass that drifts
close gets stuck there instead of being pushed back by the score) or
the inset-uniform init (``side_eps``).

This study sweeps both knobs on the flagship weights and measures, per
configuration:

  * the spherical-conversion clip rate of the inverse benchmark
    pipeline (the reference's tracked statistic,
    ``gto_halo_benchmarking.py:347-363``);
  * raw face mass: the fraction of sample components within delta of a
    cube face BEFORE conversion (direct diagnosis, no pipeline);
  * component-wise ML statistics vs the training rows (MSE,
    Wasserstein) so any distribution skew from the knobs is visible;
  * optionally (--grade) the df32 LM-30 cold feasible ratio, to check
    the warm-start quality consequence of each knob.

A PC row at matched n is the control.

Artifact: benchmark_results/ode_clip_study.json
Usage:    python scripts/ode_clip_study.py [run_dir] [n] [--grade]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _face_mass(raw: np.ndarray, delta: float = 1e-3) -> float:
    """Fraction of model-space components within delta of a cube face."""
    return float(((raw < delta) | (raw > 1 - delta)).mean())


def _ml_stats(phys: np.ndarray, ref_rows: np.ndarray) -> dict:
    from scipy.stats import wasserstein_distance
    n = min(len(phys), len(ref_rows))
    a, b = phys[:n], ref_rows[:n]
    return {
        "mse": round(float(np.mean((a - b) ** 2)), 5),
        "wasserstein_mean": round(float(np.mean([
            wasserstein_distance(a[:, j], b[:, j])
            for j in range(a.shape[1])])), 5),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", nargs="?",
                   default="Training Runs/2026.08.17_184657")
    p.add_argument("n", nargs="?", type=int, default=1024)
    p.add_argument("--grade", action="store_true",
                   help="also grade each config with the df32 oracle "
                        "(LM-30 cold)")
    p.add_argument("--out", default="benchmark_results/ode_clip_study.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import pickle

    from rdm_tpu.benchmark.gto_halo import (GTOHaloBenchmarkConfig,
                                            GTOHaloBenchmarker)
    from rdm_tpu.models.registry import get_cf_score_fn
    from rdm_tpu.sampling.ode import get_ode_sampler
    from rdm_tpu.sampling import get_pc_sampler

    bench = GTOHaloBenchmarker(GTOHaloBenchmarkConfig(
        model_path=args.run_dir, num_samples=args.n, batch_size=args.n,
        enable_physical_validation=False, output_dir="/tmp/ode_clip"))
    lm = bench.lm
    cfg = lm.cfg
    B = args.n
    shape = (B, 9, 9, 1)

    # training rows are already model-space [0,1] 67-vectors: directly
    # comparable with the raw samples (no pipeline round trip needed)
    gt = np.asarray(pickle.load(
        open("datasets/training_data_boundary_80073.pkl", "rb")),
        dtype=np.float64)[: args.n, :67]

    configs = [
        {"sampler": "pc", "label": "pc1000 (control)"},
        {"sampler": "pc", "steps": 250, "label": "pc250 (production schedule)"},
        {"sampler": "pc", "steps": 100, "label": "pc100"},
        {"sampler": "ode", "moll": 200, "side_eps": 1e-2,
         "label": "ode default (moll=200)"},
        {"sampler": "ode", "moll": 50, "side_eps": 1e-2,
         "label": "ode sharper damping (moll=50)"},
        {"sampler": "ode", "moll": 800, "side_eps": 1e-2,
         "label": "ode gentler damping (moll=800)"},
        {"sampler": "ode", "moll": 0, "side_eps": 1e-2,
         "label": "ode no mollifier"},
        {"sampler": "ode", "moll": 200, "side_eps": 1e-3,
         "label": "ode smaller init inset"},
        {"sampler": "ode", "moll": 200, "side_eps": 5e-2,
         "label": "ode larger init inset"},
    ]

    rows = []
    for c in configs:
        def run(key, c=c):
            kl, ks = jax.random.split(key)
            labels = jax.random.uniform(kl, (B, 1))
            score_fn = get_cf_score_fn(lm.sde, lm.model, lm.ema_params,
                                       labels, 0.0)
            if c["sampler"] == "pc":
                sde_use = lm.sde
                if c.get("steps"):
                    from rdm_tpu.sde import RVESDE
                    sc = lm.cfg.sde
                    sde_use = RVESDE(sc.sigma_min, sc.sigma_max,
                                     int(c["steps"]))
                sampler = get_pc_sampler(sde_use, shape, eps=1e-5)
                score_fn = get_cf_score_fn(sde_use, lm.model, lm.ema_params,
                                           labels, 0.0)
                x, nfe = sampler(score_fn, ks)
            else:
                sampler = get_ode_sampler(lm.sde, shape, moll=c["moll"],
                                          side_eps=c["side_eps"])
                x, nfe = sampler(score_fn, ks)
            return x, nfe

        t0 = time.time()
        x, nfe = jax.jit(run)(jax.random.PRNGKey(0))
        raw = np.asarray(x).reshape(B, -1)[:, :67]
        dt = time.time() - t0

        bench.total_spherical_clips = 0
        bench.total_spherical_elements = 0
        phys = bench._inverse_pipeline(raw)
        clip_rate = (bench.total_spherical_clips
                     / max(1, bench.total_spherical_elements))
        row = {
            **{k: v for k, v in c.items()},
            "n": B,
            "nfe": int(np.asarray(nfe).max()) if np.ndim(nfe) else int(nfe),
            "clip_rate": round(float(clip_rate), 5),
            "face_mass_1e-3": round(_face_mass(raw, 1e-3), 5),
            "face_mass_1e-2": round(_face_mass(raw, 1e-2), 5),
            **_ml_stats(raw, gt),
            "wall_s": round(dt, 1),
        }
        if args.grade:
            from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu
            res = refine_warmstarts_tpu(
                phys[:, 1:].astype(np.float32),
                phys[:, 0].astype(np.float32),
                max_iters=30, precision="df32")
            row["feasible_cold_df32"] = round(float(res["feasible"].mean()), 4)
        rows.append(row)
        print(row, flush=True)

    out = {"run_dir": args.run_dir, "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
