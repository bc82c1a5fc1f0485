#!/usr/bin/env python
"""Mass-produce the GTO->Halo training dataset on the accelerator.

The reference builds its 100k-row training pickle with a CPU fleet: 11
SLURM jobs (one per fixed alpha slice 0.0..1.0, ``run/data_generation/
fixed/boundary_uniform_seed_alpha_*.slurm``), each fanning 28 srun tasks
that uniform-sample initial guesses and run one ~17-20 s SNOPT solve per
seed (``cr3bp_earth_mission_simulator_boundary_fixed_alpha.py``), then
``prepare_training_data.py`` filters ``final_mass > 408`` and normalises.

This script replaces the fleet with ONE device: every round solves a
4096-wide tile of warm starts as a single vmapped LM program
(``rdm_tpu.physics.solver_tpu``).  Because uniform feasibility yield is
~1-3%, rounds mix two guess sources:

* explore — uniform draws in the NLP box (the reference's
  ``CR3BPInitGenerator.uniform_sample`` distribution);
* amplify — Gaussian perturbations of already-found feasible solutions
  (clipped to the box).  A solution's basin is far denser in feasible
  warm starts than the uniform box, so amplification multiplies yield
  ~10x while the perturbation scale keeps rows from collapsing onto
  their parents.  Parents are drawn from the *least-filled* alpha bins
  so the 11 reference slices fill evenly.

An optional final pass re-solves every collected row in ``optimal`` mode
(the reference datagen default, ``fixed_alpha.py``), running the
mass-ascent ratchet from the already-feasible point so rows carry
locally mass-optimal controls and an inform-1 certificate.

Output: ``training_data_boundary_{n}.pkl`` ([N, 67] float32 in [0, 1]),
normalised by the SAME ``rdm_tpu.datagen.normalize_result`` used for the
reference per-file workflow (``generate_data.py``).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SEG = 20
NVAR = 66
ALPHAS = np.linspace(0.0, 1.0, 11)
HE_OF_ALPHA = 0.008 + ALPHAS * (0.095 - 0.008)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=int, default=80_000,
                   help="feasible rows to collect (total over 11 alpha bins)")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--max_iters", type=int, default=12,
                   help="LM budget per round (short: rounds are cheap, "
                        "non-converged lanes get retried via amplify)")
    p.add_argument("--sigma", type=float, default=0.05,
                   help="amplify perturbation, fraction of each dim's range")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", default="datasets")
    p.add_argument("--state", default=None,
                   help="npz checkpoint path (resume/inspect); default "
                        "<out_dir>/datagen_state.npz")
    p.add_argument("--optimal_pass", action="store_true",
                   help="finish with an optimal-mode re-solve of every row "
                        "(mass-ascent ratchet; reference datagen default)")
    p.add_argument("--optimal_iters", type=int, default=12,
                   help="base feasibility budget of the optimal pass")
    p.add_argument("--max_rounds", type=int, default=10_000)
    p.add_argument("--max_minutes", type=float, default=1e9)
    p.add_argument("--min_mass", type=float, default=408.0)
    p.add_argument("--max_mass", type=float, default=470.0)
    p.add_argument("--explore_frac", type=float, default=0.25,
                   help="fraction of each round kept uniform once amplify "
                        "is possible (keeps discovering new basins)")
    args = p.parse_args(argv)

    from rdm_tpu.physics.oracle import nlp_box
    from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu

    lo, hi = nlp_box(N_SEG, 40.0, 15.0, 0.0, 5.0, 11.0,
                     args.min_mass, args.max_mass)
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    state_path = args.state or os.path.join(args.out_dir, "datagen_state.npz")

    # pools[b] = list of feasible 66-rows for alpha bin b
    pools = [[] for _ in ALPHAS]
    if os.path.exists(state_path):
        z = np.load(state_path, allow_pickle=True)
        for b in range(len(ALPHAS)):
            pools[b] = [r for r in z[f"bin{b}"]]
        print(f"resumed: {[len(q) for q in pools]} from {state_path}")

    per_bin = -(-args.target // len(ALPHAS))
    t0 = time.time()
    n_solved = 0

    def save_state():
        np.savez_compressed(
            state_path, **{f"bin{b}": np.asarray(pools[b], np.float64)
                           for b in range(len(ALPHAS))})

    for rnd in range(args.max_rounds):
        fill = np.array([len(q) for q in pools], float)
        if fill.min() >= per_bin:
            break
        if (time.time() - t0) / 60 > args.max_minutes:
            print("time budget reached")
            break
        # need-weighted bin assignment: underfilled bins get more lanes
        need = np.maximum(per_bin - fill, 0.0)
        w = need / need.sum()
        bins = rng.choice(len(ALPHAS), size=args.batch, p=w)
        he = HE_OF_ALPHA[bins]

        G = np.empty((args.batch, NVAR))
        n_explore = 0
        for i, b in enumerate(bins):
            pool = pools[b]
            if pool and rng.random() > args.explore_frac:
                parent = pool[rng.integers(len(pool))]
                g = parent + rng.standard_normal(NVAR) * args.sigma * (hi - lo)
                G[i] = np.clip(g, lo, hi)
            else:
                G[i] = rng.uniform(lo, hi)
                n_explore += 1

        res = refine_warmstarts_tpu(
            G, he, max_iters=args.max_iters, solver_mode="feasible",
            min_mass=args.min_mass, max_mass=args.max_mass,
            batch_tile=args.batch)
        n_solved += args.batch
        feas = res["feasible"]
        for i in np.nonzero(feas)[0]:
            if len(pools[bins[i]]) < per_bin * 2:
                pools[bins[i]].append(res["refined"][i])

        if rnd % 10 == 0 or fill.min() >= per_bin:
            total = int(sum(len(q) for q in pools))
            rate = total / max(time.time() - t0, 1e-9)
            print(f"round {rnd}: +{int(feas.sum())}/{args.batch} "
                  f"(explore {n_explore}) total {total} "
                  f"bins {[len(q) for q in pools]} "
                  f"{rate:.1f} feasible/s", flush=True)
            save_state()

    save_state()
    rows66 = np.concatenate(
        [np.asarray(pools[b][:per_bin * 2], np.float64).reshape(-1, NVAR)
         for b in range(len(ALPHAS))])
    hes = np.concatenate(
        [np.full(min(len(pools[b]), per_bin * 2), HE_OF_ALPHA[b])
         for b in range(len(ALPHAS))])
    print(f"collected {len(rows66)} feasible rows "
          f"({n_solved} solves, {(time.time() - t0) / 60:.1f} min)")

    if args.optimal_pass:
        t1 = time.time()
        out_rows, out_hes = [], []
        for lo_i in range(0, len(rows66), args.batch):
            chunk = rows66[lo_i:lo_i + args.batch]
            hchunk = hes[lo_i:lo_i + args.batch]
            res = refine_warmstarts_tpu(
                chunk, hchunk, max_iters=args.optimal_iters,
                solver_mode="optimal", min_mass=args.min_mass,
                max_mass=args.max_mass, batch_tile=args.batch)
            keep = res["feasible"]
            out_rows.append(res["refined"][keep])
            out_hes.append(hchunk[keep])
            print(f"optimal pass {lo_i + len(chunk)}/{len(rows66)}: "
                  f"feasible {int(keep.sum())}/{len(chunk)} "
                  f"inform1 {int(res['optimal'].sum())} "
                  f"mass μ={res['final_mass'][keep].mean():.1f}", flush=True)
        rows66 = np.concatenate(out_rows)
        hes = np.concatenate(out_hes)
        print(f"optimal pass done in {(time.time() - t1) / 60:.1f} min, "
              f"{len(rows66)} rows")

    # ---- normalise through the SAME path as the per-file workflow ----
    from rdm_tpu.datagen import get_halo_period, normalize_result

    period = {float(h): get_halo_period(float(h)) for h in HE_OF_ALPHA}
    out = []
    for g, h in zip(rows66, hes):
        control = g.copy()
        control[-2] = control[-2] * period[float(h)]   # tau -> TU
        vec = normalize_result({"results.control": control,
                                "cost_alpha": float(h)})
        if vec is not None:
            out.append(vec)
    data = np.asarray(out, np.float32)
    path = os.path.join(args.out_dir, f"training_data_boundary_{len(data)}.pkl")
    with open(path, "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {path} shape {data.shape} "
          f"range [{data.min():.4f}, {data.max():.4f}]")


if __name__ == "__main__":
    main()
