#!/usr/bin/env python
"""Unified benchmark CLI (reference ``Benchmark/run_benchmark.py:24-227``).

    python run_benchmark.py --model_path "Training Runs/..." \
        --benchmark_type both --num_samples 100 --batch_size 50 [--test_mode]
"""
from __future__ import annotations

import argparse
import os


def make_parser():
    p = argparse.ArgumentParser(description="Comprehensive diffusion model evaluation")
    p.add_argument("--benchmark_type", default="both",
                   choices=["ml_only", "gto_halo_only", "both"])
    p.add_argument("--model_path", required=True,
                   help="training run directory (contains .hydra/ and checkpoints/)")
    p.add_argument("--config_path", default=None,
                   help="directory with .hydra/config.yaml if different from model_path")
    p.add_argument("--data_path", default=None,
                   help="reference pkl for ML statistics")
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--sampling_method", default="pc", choices=["pc", "ode"])
    p.add_argument("--num_steps", type=int, default=None,
                   help="override the run config's SDE discretisation "
                        "steps (default: the run's own N; the NFE sweep "
                        "shows 250 grades within noise of 1000 at ~4x "
                        "throughput)")
    p.add_argument("--guidance_weight", type=float, default=0.0)
    p.add_argument("--enable_physical_validation", action="store_true", default=True)
    p.add_argument("--disable_physical_validation", dest="enable_physical_validation",
                   action="store_false")
    p.add_argument("--oracle_backend", default=None,
                   choices=[None, "pydylan", "hybrid", "tpu", "native", "jax"],
                   help="default auto: pydylan > hybrid (TPU f32 solve + "
                        "native f64 polish) > tpu > native > jax")
    p.add_argument("--max_workers", type=int, default=None)
    p.add_argument("--oracle_mbh_rounds", type=int, default=8,
                   help="monotonic basin hops of still-infeasible lanes "
                        "(the reference's SNOPT runs under MBH); 0 = one "
                        "cold local solve per sample")
    p.add_argument("--oracle_precision", default="df32",
                   choices=["df32", "f32"],
                   help="tpu-backend solver arithmetic: df32 (default) "
                        "polishes with double-float32 so on-device grading "
                        "matches the f64 C++ oracle; f32 is faster but "
                        "floors at the transfer sensitivity x 2^-24")
    p.add_argument("--output_dir", default="benchmark_results")
    p.add_argument("--save_samples", action="store_true", default=True)
    p.add_argument("--save_plots", action="store_true", default=True)
    p.add_argument("--device", default=None, help="ignored (jit placement)")
    p.add_argument("--test_mode", action="store_true",
                   help="cap at 10 samples / batch 5 for smoke testing")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)

    from rdm_tpu.benchmark import (GTOHaloBenchmarker, GTOHaloBenchmarkConfig,
                                   MLStatisticsBenchmarker, MLStatisticsConfig)

    results = {}
    if args.benchmark_type in ("ml_only", "both"):
        print("=" * 60)
        print("RUNNING ML STATISTICS BENCHMARK")
        print("=" * 60)
        cfg = MLStatisticsConfig(
            model_path=args.model_path, config_path=args.config_path,
            data_path=args.data_path, num_samples=args.num_samples,
            batch_size=args.batch_size, sampling_method=args.sampling_method,
            guidance_weight=args.guidance_weight,
            output_dir=os.path.join(args.output_dir, "ml_statistics"),
            save_samples=args.save_samples, save_plots=args.save_plots,
            device=args.device, test_mode=args.test_mode)
        results["ml_statistics"] = MLStatisticsBenchmarker(cfg).run_benchmark()

    if args.benchmark_type in ("gto_halo_only", "both"):
        print("=" * 60)
        print("RUNNING GTO HALO BENCHMARK")
        print("=" * 60)
        cfg = GTOHaloBenchmarkConfig(
            model_path=args.model_path, config_path=args.config_path,
            num_samples=args.num_samples, batch_size=args.batch_size,
            sampling_method=args.sampling_method,
            guidance_weight=args.guidance_weight,
            enable_physical_validation=args.enable_physical_validation,
            output_dir=os.path.join(args.output_dir, "gto_halo"),
            save_samples=args.save_samples, save_plots=args.save_plots,
            device=args.device, max_workers=args.max_workers,
            test_mode=args.test_mode, oracle_backend=args.oracle_backend,
            oracle_mbh_rounds=args.oracle_mbh_rounds,
            oracle_precision=args.oracle_precision,
            num_steps=args.num_steps)
        results["gto_halo"] = GTOHaloBenchmarker(cfg).run_benchmark()

    print("\nBenchmarks complete. Results under", args.output_dir)
    return results


if __name__ == "__main__":
    main()
