"""Benchmark-suite tests: inverse pipeline algebra + end-to-end run against
a tiny trained run directory (the reference's benchmark-as-test strategy,
SURVEY.md section 4.1, made hermetic)."""
import json
import os
import pickle

import numpy as np
import pytest

from rdm_tpu.benchmark import (GTOHaloBenchmarker, GTOHaloBenchmarkConfig,
                               MLStatisticsBenchmarker, MLStatisticsConfig)
from rdm_tpu.benchmark.gto_halo import GTO_MEAN, GTO_STD
from rdm_tpu.config import load_config, save_config_snapshot
from rdm_tpu.data import make_synthetic_gto_pkl
from rdm_tpu.training import trainer


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Train a tiny model for a few steps to produce a real run directory."""
    tmp = tmp_path_factory.mktemp("bench_run")
    pkl = make_synthetic_gto_pkl(str(tmp / "train.pkl"), n=64, seed=0)
    cfg = load_config("train", overrides=[
        f"data.pkl_path={pkl}",
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0",
        "training.batch_size=8", "eval.batch_size=8",
        "training.n_iters=3", "training.snapshot_freq=3",
        "training.eval_freq=10", "training.snapshot_freq_for_preemption=100",
        "training.snapshot_sampling=false",
        "sde.num_scales=8", "optim.warmup=1",
    ])
    work_dir = str(tmp / "work")
    os.makedirs(work_dir)
    save_config_snapshot(cfg, work_dir)
    trainer.run(cfg, work_dir)
    return work_dir, pkl


def test_inverse_pipeline_roundtrip():
    """Feed model-space values constructed FROM a known physical vector and
    check the pipeline reproduces the physical quantities."""
    cfgb = GTOHaloBenchmarkConfig.__new__(GTOHaloBenchmarkConfig)  # no model load
    b = GTOHaloBenchmarker.__new__(GTOHaloBenchmarker)
    b.config = cfgb
    b.total_spherical_clips = 0
    b.total_spherical_elements = 0

    rng = np.random.default_rng(0)
    N = 16
    model_space = rng.uniform(0.05, 0.95, (N, 67)).astype(np.float32)
    out = b._inverse_pipeline(model_space)

    assert out.shape == (N, 67)
    # halo energy from the generated label slot
    np.testing.assert_allclose(out[:, 0], model_space[:, 0] * (0.095 - 0.008) + 0.008,
                               rtol=1e-5)
    # shooting time destandardised then scaled to [0, 40]
    expect = (model_space[:, 1] * GTO_STD + GTO_MEAN) * 40.0
    np.testing.assert_allclose(out[:, 1], expect, rtol=1e-5)
    # controls are spherical: alpha in [0, 2pi], magnitude r <= 1
    ctrl = out[:, 4:64].reshape(N, 20, 3)
    assert (ctrl[:, :, 0] >= 0).all() and (ctrl[:, :, 0] <= 2 * np.pi + 1e-6).all()
    assert (ctrl[:, :, 2] >= 0).all() and (ctrl[:, :, 2] <= 1.0 + 1e-6).all()
    # fuel mass in [408, 470]
    assert (out[:, 64] >= 408 - 12).all() and (out[:, 64] <= 470 + 12).all()
    # spherical magnitude r equals |u| of the cartesian triple (clipped at 1)
    cart = ((model_space[:, 4:64] * GTO_STD + GTO_MEAN) * 2 - 1).reshape(N, 20, 3)
    u = np.minimum(np.linalg.norm(cart, axis=-1), 1.0)
    np.testing.assert_allclose(ctrl[:, :, 2], u, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_gto_halo_benchmark_end_to_end(run_dir, tmp_path):
    work_dir, pkl = run_dir
    cfg = GTOHaloBenchmarkConfig(
        model_path=work_dir, num_samples=6, batch_size=3,
        output_dir=str(tmp_path / "out_gto"), test_mode=False,
        oracle_backend="jax")
    bench = GTOHaloBenchmarker(cfg)
    # shrink the sampler for CPU speed
    bench.lm.cfg.sde.num_scales = 8
    import rdm_tpu.sde as sde_lib
    bench.lm.sde = sde_lib.RVESDE(0.01, 5.0, 8)
    results = bench.run_benchmark()

    assert "gto_halo_metrics" in results
    m = results["gto_halo_metrics"]
    assert not m["has_nan"] and not m["has_inf"]
    pv = results["physical_validation"]
    assert pv["total_tested"] == 6
    assert 0.0 <= pv["feasible_ratio"] <= 1.0
    assert pv["oracle_backend"] == "jax"
    eff = results["sampling_efficiency"]
    assert eff["samples_per_second"] > 0

    out = tmp_path / "out_gto"
    assert (out / "gto_halo_results.json").exists()
    assert (out / "summary.txt").exists()
    assert (out / "generated_samples.npy").exists()
    assert (out / "spherical_clipping_stats.txt").exists()
    saved = np.load(out / "generated_samples.npy")
    assert saved.shape == (6, 67)
    # physical ranges after the inverse pipeline
    assert (saved[:, 0] >= 0.008 - 1e-6).all() and (saved[:, 0] <= 0.095 + 1e-6).all()


@pytest.mark.slow
def test_ml_statistics_end_to_end(run_dir, tmp_path):
    work_dir, pkl = run_dir
    cfg = MLStatisticsConfig(
        model_path=work_dir, data_path=pkl, num_samples=6, batch_size=3,
        output_dir=str(tmp_path / "out_ml"))
    bench = MLStatisticsBenchmarker(cfg)
    import rdm_tpu.sde as sde_lib
    bench.lm.sde = sde_lib.RVESDE(0.01, 5.0, 8)
    results = bench.run_benchmark()

    sm = results["standard_metrics"]
    for k in ("mse", "mae", "kl_divergence", "wasserstein_distance"):
        assert np.isfinite(sm[k]), k
    out = tmp_path / "out_ml"
    assert (out / "ml_statistics_results.json").exists()
    assert (out / "summary.txt").exists()
    data = json.load(open(out / "ml_statistics_results.json"))
    assert "standard_metrics" in data


@pytest.mark.slow
def test_run_benchmark_cli(run_dir, tmp_path):
    work_dir, pkl = run_dir
    import run_benchmark as rb
    # ODE method on a tiny model through the CLI path, physical validation off
    results = rb.main([
        "--model_path", work_dir, "--data_path", pkl,
        "--benchmark_type", "ml_only", "--num_samples", "4",
        "--batch_size", "2", "--output_dir", str(tmp_path / "cli_out"),
        "--test_mode"])
    assert "ml_statistics" in results


def test_image_metrics_psnr_ssim():
    from rdm_tpu.benchmark.ml_statistics import MLStatisticsBenchmarker as M
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (4, 8, 8, 3))
    # identical images: PSNR very high, SSIM ~1
    m = M.compute_image_metrics(ref, ref)
    assert m["psnr_mean"] > 60 and m["ssim_mean"] > 0.99
    # noisy images: lower PSNR, SSIM < 1
    noisy = np.clip(ref + rng.normal(0, 0.1, ref.shape), 0, 1)
    m2 = M.compute_image_metrics(noisy, ref)
    assert 10 < m2["psnr_mean"] < m["psnr_mean"]
    assert m2["ssim_mean"] < m["ssim_mean"]


@pytest.mark.slow
def test_regrade_benchmark_tool(tmp_path):
    """scripts/regrade_benchmark.py re-runs ONLY physical validation on a
    stored artifact and keeps the pre-regrade numbers in the JSON."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "regrade_benchmark",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "regrade_benchmark.py"))
    regrade_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(regrade_mod)

    # synthesize a physical-space artifact via the real inverse pipeline
    bench = GTOHaloBenchmarker.__new__(GTOHaloBenchmarker)
    bench.total_spherical_clips = 0
    bench.total_spherical_elements = 0
    rng = np.random.default_rng(0)
    model_space = rng.uniform(0.2, 0.8, (4, 67))
    samples = bench._inverse_pipeline(model_space)

    gto_dir = tmp_path / "artifact" / "gto_halo"
    os.makedirs(gto_dir)
    np.save(gto_dir / "generated_samples.npy", samples)
    stale = {"gto_halo_metrics": {"has_nan": False},
             "physical_validation": {
                 "feasible_ratio": 0.25, "local_optimal_ratio": 0.0,
                 "oracle_backend": "tpu",
                 "oracle_grading_precision": "f32"}}
    with open(gto_dir / "gto_halo_results.json", "w") as f:
        json.dump(stale, f)

    new = regrade_mod.regrade(
        str(tmp_path / "artifact"), oracle_backend="jax",
        oracle_precision="df32", mbh_rounds=0, max_iters=2,
        solver_mode="feasible")
    assert new["oracle_backend"] == "jax"
    assert new["regraded_from"]["feasible_ratio"] == 0.25
    assert new["regraded_from"]["oracle_grading_precision"] == "f32"

    updated = json.load(open(gto_dir / "gto_halo_results.json"))
    assert updated["physical_validation_pre_regrade"]["feasible_ratio"] == 0.25
    assert updated["physical_validation"]["total_tested"] == 4
    summary = open(gto_dir / "summary.txt").read()
    assert "PHYSICAL_VALIDATION" in summary
    assert "pre_regrade".upper() not in summary
