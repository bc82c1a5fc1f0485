#!/usr/bin/env python
"""CR3BP training-data generation driver (reference
``GTO_Halo_DM/data_generation_scripts/cr3bp_earth_mission_simulator_
boundary_fixed_alpha.py``): sample initial guesses, solve/validate each
through the simulator oracle, and pickle feasible solutions — then
``rdm_tpu.datagen.prepare_training_data`` turns them into the [N, 67]
training pickle.

With pydylan installed the oracle is the reference's SNOPT solve; without
it, the JAX feasibility oracle filters dynamically-consistent guesses
(useful for smoke-testing the full data path on any machine).
"""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seed_step", type=int, default=100,
                   help="number of seeds to process starting at --seed")
    p.add_argument("--initial_guess_sample_mode", default="uniform_sample",
                   choices=["uniform_sample", "from_pickle", "from_diffusion",
                            "gt_example"])
    p.add_argument("--guess_path", default=None,
                   help="pickle path for from_pickle/from_diffusion modes")
    p.add_argument("--alpha", type=float, default=None,
                   help="fixed normalised halo energy in [0,1]; default random")
    p.add_argument("--number_of_segments", type=int, default=20)
    p.add_argument("--maximum_shooting_time", type=float, default=40.0)
    p.add_argument("--minimum_shooting_time", type=float, default=0.0)
    p.add_argument("--start_bdry", type=float, default=6.48423370092)
    p.add_argument("--end_bdry", type=float, default=8.0)
    p.add_argument("--thrust", type=float, default=1.0)
    p.add_argument("--solver_mode", default="optimal",
                   choices=["feasible", "optimal"],
                   help="reference fixed_alpha.py default: optimal")
    p.add_argument("--min_mass_to_sample", type=float, default=408)
    p.add_argument("--max_mass_to_sample", type=float, default=470)
    p.add_argument("--snopt_time_limit", type=float, default=500.0)
    p.add_argument("--result_folder", required=True)
    p.add_argument("--save_infeasible", action="store_true")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "pydylan", "tpu", "native", "jax"],
                   help="oracle backend; 'tpu' solves the whole seed range "
                        "as batched LM on the accelerator")
    p.add_argument("--batch_tile", type=int, default=4096,
                   help="TPU backend: samples per compiled refinement tile")
    p.add_argument("--max_iters", type=int, default=30,
                   help="tpu/native backends: LM iteration budget per sample")
    p.add_argument("--n_devices", type=int, default=0,
                   help="TPU backend: shard refinement over this many local "
                        "devices (0 = all)")
    args = p.parse_args(argv)

    from rdm_tpu.datagen import CR3BPInitGenerator
    from rdm_tpu.physics import oracle as oracle_lib
    from rdm_tpu.physics.oracle import CR3BPEarthMissionWarmstartSimulatorBoundary

    backend = args.backend
    if backend == "auto":
        if oracle_lib.PYDYLAN_AVAILABLE:
            backend = "pydylan"
        else:
            try:
                import jax
                backend = "tpu" if jax.default_backend() != "cpu" else "native"
            except Exception:
                backend = "native"
            if backend == "native" and not oracle_lib.native_available():
                backend = "jax"

    os.makedirs(args.result_folder, exist_ok=True)
    gen = CR3BPInitGenerator(
        initial_guess_sample_mode=args.initial_guess_sample_mode,
        thrust=args.thrust, min_mass_to_sample=args.min_mass_to_sample,
        max_mass_to_sample=args.max_mass_to_sample,
        min_manifold_length=5.0, max_manifold_length=11.0,
        pickle_path=args.guess_path, diffusion_path=args.guess_path)
    sim = CR3BPEarthMissionWarmstartSimulatorBoundary(
        seed=args.seed, seed_step=args.seed_step,
        number_of_segments=args.number_of_segments,
        maximum_shooting_time=args.maximum_shooting_time,
        minimum_shooting_time=args.minimum_shooting_time,
        start_bdry=args.start_bdry, end_bdry=args.end_bdry,
        thrust=args.thrust, solver_mode=args.solver_mode,
        min_mass_to_sample=args.min_mass_to_sample,
        max_mass_to_sample=args.max_mass_to_sample,
        snopt_time_limit=args.snopt_time_limit,
        result_folder=args.result_folder, backend=backend)

    if (backend in ("tpu", "native")
            and args.initial_guess_sample_mode == "uniform_sample"):
        _run_batched(args, gen, backend)
        return

    n_feasible = 0
    for seed in range(args.seed, args.seed + args.seed_step):
        halo_energy, guesses = gen.get_earth_initial_guess(
            seed, args.number_of_segments, args.maximum_shooting_time,
            args.minimum_shooting_time)
        if args.alpha is not None:
            # reference fixed-alpha mapping 0.008 + alpha * (0.095 - 0.008)
            halo_energy = 0.008 + args.alpha * (0.095 - 0.008)
        for guess in guesses:
            result = sim.simulate(earth_initial_guess=guess,
                                  halo_energy=halo_energy)
            # match the solver's control layout expected downstream
            if result["feasibility"] or args.save_infeasible:
                if backend != "pydylan":
                    _period_to_tu(result, halo_energy)
                tag = "feasible" if result["feasibility"] else "infeasible"
                path = os.path.join(
                    args.result_folder,
                    f"{tag}_cr3bp_earth_alpha_{halo_energy:.4f}_seed_{seed}.pkl")
                with open(path, "wb") as f:
                    pickle.dump([result], f)
                if result["feasibility"]:
                    n_feasible += 1
        print(f"seed {seed}: feasible so far {n_feasible}")
    print(f"done: {n_feasible} feasible solutions in {args.result_folder}")


def _period_to_tu(result, halo_energy):
    """The native/TPU/JAX solvers refine the halo-period slot as the
    NORMALISED orbit-phase fraction in [0, 1] (it parametrises the
    manifold boundary condition directly).  SNOPT's control state carries
    it in TU (the reference multiplies the guess by ``halo.orbit_period``
    before injection, ``cr3bp_...warmstart.py:165``, and
    ``prepare_training_data.py:92`` divides it back out).  Convert so
    downstream normalisation round-trips identically for every backend."""
    from rdm_tpu.datagen import get_halo_period
    control = result["results.control"].copy()
    control[-2] = control[-2] * get_halo_period(float(halo_energy))
    result["results.control"] = control


def _run_batched(args, gen, backend):
    """Solve the whole seed range as one (tiled) batch — the TPU-native
    replacement for the reference's 28-way SLURM srun fan-out
    (``run/data_generation/fixed/*.slurm``)."""
    import time

    import numpy as np

    t0 = time.time()
    guesses, energies, seeds = [], [], []
    for seed in range(args.seed, args.seed + args.seed_step):
        halo_energy, gl = gen.get_earth_initial_guess(
            seed, args.number_of_segments, args.maximum_shooting_time,
            args.minimum_shooting_time)
        if args.alpha is not None:
            halo_energy = 0.008 + args.alpha * (0.095 - 0.008)
        for g in gl:
            guesses.append(g)
            energies.append(halo_energy)
            seeds.append(seed)
    G = np.stack(guesses)
    H = np.asarray(energies)

    if backend == "tpu":
        from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu
        res = refine_warmstarts_tpu(
            G, H, thrust=args.thrust, n_segments=args.number_of_segments,
            start_bdry=args.start_bdry, max_iters=args.max_iters,
            max_shoot=args.maximum_shooting_time,
            min_shoot=args.minimum_shooting_time,
            batch_tile=args.batch_tile, n_devices=args.n_devices,
            min_mass=args.min_mass_to_sample,
            max_mass=args.max_mass_to_sample,
            solver_mode=args.solver_mode)
        shoots_per_iter = 15   # 7 jacrev cotangents + 8 ladder trials
    else:
        from rdm_tpu.physics.oracle import evaluate_warmstarts_native
        res = evaluate_warmstarts_native(
            G, H, thrust=args.thrust, n_segments=args.number_of_segments,
            start_bdry=args.start_bdry, max_iters=args.max_iters,
            max_shoot=args.maximum_shooting_time,
            min_shoot=args.minimum_shooting_time,
            min_mass=args.min_mass_to_sample,
            max_mass=args.max_mass_to_sample,
            solver_mode=args.solver_mode)
        shoots_per_iter = 70   # 66-column finite differences + trials
    per_sample = (time.time() - t0) / len(G)

    n_feasible = 0
    for i in range(len(G)):
        feasible = bool(res["feasible"][i])
        if not feasible and not args.save_infeasible:
            continue
        result = {
            "results.control": res["refined"][i],
            "feasibility": feasible,
            "snopt_control_evaluations": int(res["iters"][i]) * shoots_per_iter,
            "snopt_inform": int(res["inform"][i]),
            "thrust": args.thrust,
            "solving_time": per_sample,
            "cost_alpha": float(H[i]),
        }
        _period_to_tu(result, H[i])
        tag = "feasible" if feasible else "infeasible"
        path = os.path.join(
            args.result_folder,
            f"{tag}_cr3bp_earth_alpha_{H[i]:.4f}_seed_{seeds[i]}.pkl")
        with open(path, "wb") as f:
            pickle.dump([result], f)
        n_feasible += feasible
    print(f"done ({backend}, batched): {n_feasible}/{len(G)} feasible in "
          f"{args.result_folder} ({per_sample * 1e3:.1f} ms/sample)")


if __name__ == "__main__":
    main()
