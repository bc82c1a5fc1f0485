"""GTO Halo domain benchmark (reference
``Benchmark/gto_halo_benchmarking.py:92-906`` and the multithreaded variant
``gto_halo_multithreading.py``).

Pipeline: EMA sampling -> (N, 81) -> (N, 67) -> inverse data pipeline
(de-standardise model outputs, per-variable physical unnormalisation,
cartesian -> spherical controls with clip tracking) -> component statistics
-> physical validation through the CR3BP oracle -> JSON + summary.txt +
plots.

Physical validation fan-out: with the pydylan backend each SNOPT solve runs
in a thread pool (``max_workers``), mirroring the reference MT benchmark;
with the JAX fallback oracle the whole batch evaluates as ONE vmapped
program instead (TPU-native replacement for the thread pool).
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import numpy as np

from rdm_tpu.physics import oracle as oracle_lib
from .common import (LoadedModel, generate_raw_samples,
                     sampling_efficiency_metrics)

# physical unnormalisation constants (gto_halo_benchmarking.py:272-283)
MIN_SHOOTING_TIME, MAX_SHOOTING_TIME = 0.0, 40.0
MIN_COAST_TIME, MAX_COAST_TIME = 0.0, 15.0
MIN_HALO_ENERGY, MAX_HALO_ENERGY = 0.008, 0.095
MIN_FUEL_MASS, MAX_FUEL_MASS = 408.0, 470.0
MIN_MANIFOLD_LENGTH, MAX_MANIFOLD_LENGTH = 5.0, 11.0
THRUST = 1.0
GTO_MEAN, GTO_STD = 0.4652, 0.1811


def _accelerator_present() -> bool:
    """True when JAX's default backend is an accelerator (TPU/GPU) — the
    batched LM oracle then beats the host C++ thread pool by ~100x."""
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@dataclasses.dataclass
class GTOHaloBenchmarkConfig:
    model_path: str
    config_path: Optional[str] = None
    num_samples: int = 100
    batch_size: int = 50
    sampling_method: str = "pc"
    guidance_weight: float = 0.0
    enable_physical_validation: bool = True
    output_dir: str = "benchmark_results/gto_halo"
    save_samples: bool = True
    save_plots: bool = True
    device: Optional[str] = None  # signature parity; placement is via jit
    max_workers: Optional[int] = None
    test_mode: bool = False
    oracle_backend: Optional[str] = None  # None=auto, "pydylan", "native", "jax"
    solver_mode: str = "optimal"  # reference run_benchmark default (:335)
    oracle_max_iters: int = 30
    # monotonic basin hops of still-infeasible lanes (the reference's
    # SNOPT runs under MBH, cr3bp_...warmstart.py:176); 8 hops x 30 LM
    # iters is a few hundred shoots/sample vs SNOPT's 15000-iter budget
    oracle_mbh_rounds: int = 8
    # solver arithmetic for the "tpu" backend: "df32" (default) runs the
    # mixed-precision polish so on-device grading matches the f64 C++
    # oracle's semantics (solver_tpu.py mixed-precision section); "f32"
    # is the round-2 behaviour (faster, floors at kappa * 2^-24)
    oracle_precision: str = "df32"
    # override the run config's SDE discretisation steps for sampling
    # (None = the run's own N, the reference's hardwired 1000); the NFE
    # sweep (benchmark_results/nfe_sweep.json) motivates N=250
    num_steps: Optional[int] = None


class GTOHaloBenchmarker:
    def __init__(self, config: GTOHaloBenchmarkConfig):
        self.config = config
        if config.test_mode:
            config.num_samples = min(config.num_samples, 10)
            config.batch_size = min(config.batch_size, 5)
        self.lm = LoadedModel(config.model_path, config.config_path)
        if config.sampling_method:
            self.lm.cfg.sampling.method = config.sampling_method
        self.total_spherical_clips = 0
        self.total_spherical_elements = 0

    # ------------------------------------------------------------------ #
    def generate_samples(self):
        sde_override = None
        if self.config.num_steps:
            from rdm_tpu.sde import RVESDE
            c = self.lm.cfg.sde
            sde_override = RVESDE(c.sigma_min, c.sigma_max,
                                  int(self.config.num_steps))
        raw, times = generate_raw_samples(
            self.lm, self.config.num_samples, self.config.batch_size,
            guidance_weight=self.config.guidance_weight,
            sde_override=sde_override)
        return self._inverse_pipeline(raw), times

    def _inverse_pipeline(self, samples: np.ndarray) -> np.ndarray:
        """(N, 67) model-space -> physical 67-vectors
        (reference ``gto_halo_benchmarking.py:255-330``)."""
        class_labels_normalized = samples[:, 0]
        out = samples[:, 1:].astype(np.float64)

        # de-standardise with the mean/std the run was trained with
        # (recorded in its config snapshot; reference constants by default)
        lm = getattr(self, "lm", None)
        data_cfg = lm.cfg.data if lm is not None else {}
        out = (out * data_cfg.get("gto_std", GTO_STD)
               + data_cfg.get("gto_mean", GTO_MEAN))

        # times
        out[:, 0] = out[:, 0] * (MAX_SHOOTING_TIME - MIN_SHOOTING_TIME) + MIN_SHOOTING_TIME
        out[:, 1] = out[:, 1] * (MAX_COAST_TIME - MIN_COAST_TIME) + MIN_COAST_TIME
        out[:, 2] = out[:, 2] * (MAX_COAST_TIME - MIN_COAST_TIME) + MIN_COAST_TIME

        # cartesian controls back to [-1, 1], then -> spherical
        out[:, 3:-3] = out[:, 3:-3] * 2 * THRUST - THRUST
        ctrl = out[:, 3:-3]
        n_trip = ctrl.shape[1] // 3
        ctrl = ctrl[:, :n_trip * 3].reshape(-1, n_trip, 3)
        alpha, beta, r = self._convert_to_spherical(
            ctrl[:, :, 0], ctrl[:, :, 1], ctrl[:, :, 2])
        ctrl[:, :, 0], ctrl[:, :, 1], ctrl[:, :, 2] = alpha, beta, r
        out[:, 3:3 + n_trip * 3] = ctrl.reshape(-1, n_trip * 3)

        # fuel mass / manifold length; halo period stays normalised
        out[:, -3] = out[:, -3] * (MAX_FUEL_MASS - MIN_FUEL_MASS) + MIN_FUEL_MASS
        out[:, -1] = out[:, -1] * (MAX_MANIFOLD_LENGTH - MIN_MANIFOLD_LENGTH) + MIN_MANIFOLD_LENGTH

        halo_energies = class_labels_normalized * (MAX_HALO_ENERGY - MIN_HALO_ENERGY) + MIN_HALO_ENERGY
        return np.column_stack((halo_energies, out))

    def _convert_to_spherical(self, ux, uy, uz):
        """Reference ``gto_halo_benchmarking.py:335-363`` incl. clip stats."""
        u = np.sqrt(ux**2 + uy**2 + uz**2)
        theta = np.zeros_like(u)
        nz = u != 0
        theta[nz] = np.arcsin(np.clip(uz[nz] / u[nz], -1, 1))
        alpha = np.arctan2(uy, ux)
        alpha = np.where(alpha >= 0, alpha, 2 * np.pi + alpha)
        theta = np.where(theta >= 0, theta, 2 * np.pi + theta)

        clips = int(np.sum(u > 1))
        self.total_spherical_clips += clips
        self.total_spherical_elements += u.size
        if clips:
            print(f"SPHERICAL CONVERSION CLIPPING: {clips}/{u.size} values "
                  f"({100 * clips / u.size:.2f}%) exceeded magnitude 1")
        u = np.minimum(u, 1.0)
        return alpha, theta, u

    # ------------------------------------------------------------------ #
    def compute_gto_halo_metrics(self, samples: np.ndarray) -> Dict[str, Any]:
        """Component statistics (reference ``:365-423``)."""
        if samples.size == 0:
            return {}
        groups = {
            "class_label": samples[:, 0],
            "time_vars": samples[:, 1:4],
            "thrust_vars": samples[:, 4:64],
            "mass_vars": samples[:, 64:67],
        }
        metrics: Dict[str, Any] = {}
        for name, arr in groups.items():
            metrics[f"{name}_mean"] = float(np.mean(arr))
            metrics[f"{name}_std"] = float(np.std(arr))
            metrics[f"{name}_min"] = float(np.min(arr))
            metrics[f"{name}_max"] = float(np.max(arr))
        metrics["has_nan"] = bool(np.any(np.isnan(samples)))
        metrics["has_inf"] = bool(np.any(np.isinf(samples)))
        return metrics

    # ------------------------------------------------------------------ #
    def compute_physical_validation_metrics(self, samples: np.ndarray) -> Dict[str, Any]:
        cfgb = self.config
        backend = cfgb.oracle_backend
        if backend is None:
            if oracle_lib.PYDYLAN_AVAILABLE:
                backend = "pydylan"
            elif _accelerator_present() and oracle_lib.native_available():
                backend = "hybrid"  # TPU f32 solve + native f64 polish
            elif _accelerator_present():
                backend = "tpu"     # vmapped LM solver on the accelerator
            elif oracle_lib.native_available():
                backend = "native"  # C++ LM solver (rdm_tpu/native)
            else:
                backend = "jax"
        if not cfgb.enable_physical_validation:
            return {
                "physical_validation_disabled": True,
                "reason": "disabled by configuration",
                "missing_metrics": [
                    "feasible_solution_ratio", "local_optimal_solution_ratio",
                    "average_final_mass_feasible", "average_final_mass_optimal",
                    "snopt_inform_distribution", "solving_time_analysis"],
            }

        print(f"Computing physical validation via the {backend} oracle...")
        sim_kwargs = dict(
            seed=0, seed_step=len(samples), quiet_snopt=True,
            number_of_segments=20, maximum_shooting_time=40.0,
            minimum_shooting_time=0.0, start_bdry=6.48423370092, end_bdry=8.0,
            thrust=1.0, solver_mode=cfgb.solver_mode, min_mass_to_sample=408,
            max_mass_to_sample=470, snopt_time_limit=1000.0,
            result_folder=os.path.join(cfgb.output_dir, "cr3bp_results"),
            backend=backend)

        # Steady-timing policy for the XLA-compiled backends: the first
        # call pays one-time compilation, so `avg_solving_time` from it is
        # not comparable with the reference's per-SNOPT seconds (VERDICT
        # round-1 item 9).  Re-running the identical call reuses the
        # compiled executable and measures steady time, but doubles the
        # oracle work — acceptable up to this batch size, beyond which we
        # report the first-call time and flag that it includes compile.
        _RERUN_CAP = 2048

        def _steady_time(solve_again):
            if len(samples) > _RERUN_CAP:
                return None
            t1 = time.time()
            solve_again()
            return (time.time() - t1) / max(len(samples), 1)

        t0 = time.time()
        if backend == "hybrid":
            # TPU f32 bulk solve + native f64 polish of near-miss lanes:
            # f64-grader fidelity at close to accelerator throughput
            # (BENCH_NOTES.md "f32 vs f64 grading").
            def _solve_hybrid():
                return oracle_lib.evaluate_warmstarts_hybrid(
                    samples[:, 1:].astype(np.float64),
                    samples[:, 0].astype(np.float64),
                    max_iters=cfgb.oracle_max_iters,
                    solver_mode=cfgb.solver_mode,
                    mbh_rounds=cfgb.oracle_mbh_rounds,
                    n_threads=cfgb.max_workers or 0)

            res = _solve_hybrid()
            first_per_sample = (time.time() - t0) / max(len(samples), 1)
            per_sample_time = _steady_time(_solve_hybrid) or first_per_sample
            note = ("TPU-batched f32 LM solve of the manifold-insertion "
                    "NLP + native f64 polish of near-tolerance lanes "
                    "(pydylan/SNOPT unavailable); feasible = the local "
                    "solver converged from the sample")
            results = [{
                "results.control": res["refined"][i],
                "feasibility": bool(res["feasible"][i]),
                "snopt_inform": int(res["inform"][i]),
                "thrust": 1.0,
                "solving_time": per_sample_time,
                "cost_alpha": float(samples[i, 0]),
                "final_mass": float(res["final_mass"][i]),
                "terminal_mass": float(res["terminal_mass"][i]),
            } for i in range(len(samples))]
            extra = {"oracle_backend": backend,
                     "oracle_note": note,
                     "oracle_solver_mode": cfgb.solver_mode,
                     "oracle_mbh_rounds": cfgb.oracle_mbh_rounds,
                     "oracle_wall_time_with_compile_s": time.time() - t0,
                     "avg_solving_time_includes_compile":
                         backend in ("tpu", "hybrid")
                         and len(samples) > _RERUN_CAP,
                     "mean_refine_iters": float(np.mean(res["iters"])),
                     "mean_terminal_pos_error": float(np.mean(res["pos_err"])),
                     "mean_terminal_vel_error": float(np.mean(res["vel_err"]))}
        elif backend in ("native", "tpu"):
            # ONE batched LM solve of the whole batch: the std::thread
            # fan-out inside the C++ library (the native twin of the
            # reference's ThreadPoolExecutor SNOPT fan-out), or the same
            # solve vmapped on the accelerator at ~100x its throughput
            # (rdm_tpu/physics/solver_tpu.py).
            if backend == "native":
                res = oracle_lib.evaluate_warmstarts_native(
                    samples[:, 1:].astype(np.float64),
                    samples[:, 0].astype(np.float64),
                    max_iters=cfgb.oracle_max_iters,
                    solver_mode=cfgb.solver_mode,
                    mbh_rounds=cfgb.oracle_mbh_rounds,
                    n_threads=cfgb.max_workers or 0)
                note = ("C++ Levenberg-Marquardt local solve of the "
                        "manifold-insertion NLP for each warm start "
                        "(pydylan/SNOPT unavailable); feasible = the local "
                        "solver converged from the sample")
                per_sample_time = (time.time() - t0) / max(len(samples), 1)
            else:
                from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu

                def _solve_tpu():
                    return refine_warmstarts_tpu(
                        samples[:, 1:].astype(np.float32),
                        samples[:, 0].astype(np.float32),
                        max_iters=cfgb.oracle_max_iters,
                        solver_mode=cfgb.solver_mode,
                        mbh_rounds=cfgb.oracle_mbh_rounds,
                        precision=cfgb.oracle_precision)

                res = _solve_tpu()
                note = ("TPU-batched Levenberg-Marquardt local solve of the "
                        "manifold-insertion NLP for each warm start "
                        f"({cfgb.oracle_precision} arithmetic; "
                        "pydylan/SNOPT unavailable); feasible = the local "
                        "solver converged from the sample")
                first_per_sample = (time.time() - t0) / max(len(samples), 1)
                per_sample_time = _steady_time(_solve_tpu) or first_per_sample
            results = [{
                "results.control": res["refined"][i],
                "feasibility": bool(res["feasible"][i]),
                "snopt_inform": int(res["inform"][i]),
                "thrust": 1.0,
                "solving_time": per_sample_time,
                "cost_alpha": float(samples[i, 0]),
                # the SOLVED mass variable (SNOPT's results.control[-3]
                # analogue); terminal_mass is the full forward-propagated
                # mass (distinct keys — the scales differ, see ADVICE r1)
                "final_mass": float(res["final_mass"][i]),
                "terminal_mass": float(res["terminal_mass"][i]),
            } for i in range(len(samples))]
            extra = {"oracle_backend": backend,
                     "oracle_note": note,
                     "oracle_solver_mode": cfgb.solver_mode,
                     "oracle_mbh_rounds": cfgb.oracle_mbh_rounds,
                     # grading arithmetic actually used: native is host
                     # f64; tpu is the configured precision (df32 default
                     # matches f64 semantics, f32 floors at kappa*2^-24)
                     "oracle_grading_precision":
                         "f64" if backend == "native"
                         else cfgb.oracle_precision,
                     "oracle_wall_time_with_compile_s": time.time() - t0,
                     "avg_solving_time_includes_compile":
                         backend in ("tpu", "hybrid")
                         and len(samples) > _RERUN_CAP,
                     "mean_refine_iters": float(np.mean(res["iters"])),
                     "mean_terminal_pos_error": float(np.mean(res["pos_err"])),
                     "mean_terminal_vel_error": float(np.mean(res["vel_err"]))}
        elif backend == "jax":
            # ONE vmapped evaluation of the whole batch.
            res = oracle_lib.evaluate_warmstarts(
                samples[:, 1:].astype(np.float32), samples[:, 0].astype(np.float32))
            per_sample_time = (time.time() - t0) / max(len(samples), 1)
            results = [{
                "results.control": samples[i, 1:],
                "feasibility": bool(res["feasible"][i]),
                "snopt_inform": int(res["inform"][i]),
                "thrust": 1.0,
                "solving_time": per_sample_time,
                "cost_alpha": float(samples[i, 0]),
            } for i in range(len(samples))]
            extra = {"oracle_backend": "jax",
                     "oracle_note": ("dynamical-consistency feasibility check "
                                     "(pydylan/SNOPT unavailable); ratios are "
                                     "not 1:1 comparable with SNOPT results"),
                     "mean_terminal_pos_error": float(np.mean(res["pos_err"])),
                     "mean_terminal_vel_error": float(np.mean(res["vel_err"]))}
        else:
            # ThreadPoolExecutor SNOPT fan-out with the reference MT
            # benchmark's telemetry heartbeat (gto_halo_multithreading.py:
            # 604-667): per-completion progress + a 10 s status ticker.
            import threading

            workers = cfgb.max_workers or os.cpu_count()
            done_count = {"n": 0}
            lock = threading.Lock()
            stop = threading.Event()

            def heartbeat():
                while not stop.wait(10.0):
                    with lock:
                        n = done_count["n"]
                    print(f"\U0001F4CA TELEMETRY: {n}/{len(samples)} solves "
                          f"complete ({time.time() - t0:.0f}s elapsed, "
                          f"{workers} workers)")

            def solve(i):
                s = oracle_lib.CR3BPEarthMissionWarmstartSimulatorBoundary(**sim_kwargs)
                try:
                    r = s.simulate(earth_initial_guess=samples[i, 1:],
                                   halo_energy=float(samples[i, 0]))
                except Exception as e:  # reference wraps failures
                    r = {"results.control": None, "feasibility": False,
                         "snopt_inform": None, "thrust": 1.0,
                         "solving_time": 0.0, "cost_alpha": float(samples[i, 0]),
                         "error": str(e)}
                with lock:
                    done_count["n"] += 1
                    n = done_count["n"]
                print(f"\U0001F4CA TELEMETRY: sample {i + 1} done "
                      f"({n}/{len(samples)}, feasible={r['feasibility']})")
                return r

            ticker = threading.Thread(target=heartbeat, daemon=True)
            ticker.start()
            try:
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    results = list(ex.map(solve, range(len(samples))))
            finally:
                stop.set()
            extra = {"oracle_backend": "pydylan"}

        metrics = self.compute_cr3bp_statistics(results)
        metrics.update(extra)
        return metrics

    def compute_cr3bp_statistics(self, results: List[Dict]) -> Dict[str, Any]:
        """Reference ``:533-584`` metric definitions."""
        if not results:
            return {}
        total = len(results)
        feasible = [r for r in results if r["feasibility"]]
        optimal = [r for r in results if r["feasibility"] and r.get("snopt_inform") == 1]

        def final_mass(rs):
            # prefer the solver-reported terminal mass (native/tpu backends
            # attach it); fall back to control[-3], which IS the solved
            # final mass for pydylan/SNOPT (print_statistics parity)
            vals = [r["final_mass"] if r.get("final_mass") is not None
                    else r["results.control"][-3] for r in rs
                    if r.get("final_mass") is not None
                    or r.get("results.control") is not None]
            return float(np.mean(vals)) if vals else 0.0

        informs = [r["snopt_inform"] for r in results if r.get("snopt_inform") is not None]
        dist: Dict[int, int] = {}
        for i in informs:
            dist[i] = dist.get(i, 0) + 1
        return {
            "feasible_ratio": len(feasible) / total,
            "avg_final_mass_feasible": final_mass(feasible),
            "local_optimal_ratio": len(optimal) / total,
            "avg_final_mass_optimal": final_mass(optimal),
            "avg_solving_time": float(np.mean([r["solving_time"] for r in results])),
            "snopt_inform_distribution": dist,
            "total_tested": total,
            "feasible_count": len(feasible),
            "local_optimal_count": len(optimal),
        }

    # ------------------------------------------------------------------ #
    def run_benchmark(self) -> Dict[str, Any]:
        print("Starting GTO Halo comprehensive benchmark...")
        samples, sampling_times = self.generate_samples()

        results: Dict[str, Any] = {}
        results["benchmark_config"] = {
            "model_path": self.config.model_path,
            "num_samples": self.config.num_samples,
            "sampling_method": self.config.sampling_method,
            "guidance_weight": self.config.guidance_weight,
            "num_steps": self.config.num_steps or int(self.lm.sde.N),
            "oracle_backend": self.config.oracle_backend,
            "oracle_max_iters": self.config.oracle_max_iters,
            "oracle_mbh_rounds": self.config.oracle_mbh_rounds,
            "oracle_precision": self.config.oracle_precision,
            "solver_mode": self.config.solver_mode,
        }
        results["gto_halo_metrics"] = self.compute_gto_halo_metrics(samples)
        results["physical_validation"] = self.compute_physical_validation_metrics(samples)
        results["sampling_efficiency"] = sampling_efficiency_metrics(sampling_times)

        self.save_results(results, samples)
        if self.config.save_plots:
            self.generate_plots(results, samples)
        self.print_spherical_conversion_stats()
        return results

    # ------------------------------------------------------------------ #
    def save_results(self, results: Dict[str, Any], samples: np.ndarray):
        out = self.config.output_dir
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "gto_halo_results.json"), "w") as f:
            json.dump(results, f, indent=2, default=str)
        if self.config.save_samples:
            np.save(os.path.join(out, "generated_samples.npy"), samples)
            with open(os.path.join(out, "generated_samples.pkl"), "wb") as f:
                pickle.dump(samples, f)
        lines = ["=" * 60, "GTO HALO BENCHMARK RESULTS", "=" * 60, ""]
        for section, vals in results.items():
            lines.append(f"{section.upper()}:")
            if isinstance(vals, dict):
                for k, v in vals.items():
                    lines.append(f"  {k}: {v}")
            lines.append("")
        with open(os.path.join(out, "summary.txt"), "w") as f:
            f.write("\n".join(lines))
        print("\n".join(lines))

    def print_spherical_conversion_stats(self):
        out = self.config.output_dir
        os.makedirs(out, exist_ok=True)
        total, clips = self.total_spherical_elements, self.total_spherical_clips
        rate = 100 * clips / total if total else 0.0
        text = (f"SPHERICAL CONVERSION CLIPPING STATS\n"
                f"total elements: {total}\nclipped: {clips}\nrate: {rate:.4f} %\n")
        with open(os.path.join(out, "spherical_clipping_stats.txt"), "w") as f:
            f.write(text)
        print(text)

    def generate_plots(self, results: Dict[str, Any], samples: np.ndarray):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        out = os.path.join(self.config.output_dir, "plots")
        os.makedirs(out, exist_ok=True)
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0, 0].hist(samples[:, 0], bins=30)
        axes[0, 0].set_title("halo energy")
        axes[0, 1].hist(samples[:, 1], bins=30)
        axes[0, 1].set_title("shooting time")
        axes[1, 0].hist(samples[:, 4:64].ravel(), bins=50)
        axes[1, 0].set_title("controls (spherical)")
        axes[1, 1].hist(samples[:, 64], bins=30)
        axes[1, 1].set_title("fuel mass")
        fig.tight_layout()
        fig.savefig(os.path.join(out, "component_distributions.png"), dpi=100)
        plt.close(fig)
