"""Telemetry tooling tests: log parsing contract + EDA outputs."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "telemetry"))


def test_parse_log_format(tmp_path):
    from plot_losses import parse_log_file
    log = tmp_path / "logs"
    log.write_text(
        "2026-01-01 00:00:00,000 - step: 0, training_loss: 2.08509e+01\n"
        "2026-01-01 00:00:01,000 - step: 1, training_loss: 1.95000e+01\n"
        "2026-01-01 00:00:02,000 - step: 0, evaluation_loss: 2.10000e+01\n")
    ts, tl, es, el = parse_log_file(str(log))
    assert ts == [0, 1] and es == [0]
    np.testing.assert_allclose(tl, [20.8509, 19.5], rtol=1e-4)


def test_plot_losses_end_to_end(tmp_path, monkeypatch):
    from plot_losses import main
    run = tmp_path / "Training Runs" / "2026.01.01_000000"
    run.mkdir(parents=True)
    (run / "logs").write_text(
        "x - step: 0, training_loss: 2.0e+01\nx - step: 1, training_loss: 1.0e+01\n")
    monkeypatch.chdir(tmp_path)
    assert main(out=str(tmp_path / "plot.png")) == 0
    assert (tmp_path / "plot.png").exists()


def test_comprehensive_data_analysis(tmp_path):
    from comprehensive_data_analysis import analyze
    from rdm_tpu.data import make_synthetic_gto_pkl
    pkl = make_synthetic_gto_pkl(str(tmp_path / "t.pkl"), n=200, seed=1)
    out = str(tmp_path / "analysis")
    results = analyze(pkl, out)
    assert results["n_samples"] == 200
    assert results["boundary_violation_total"] == 0
    assert results["correlation_matrix"].shape == (67, 67)
    for f in ("component_distributions.png", "spatial_patterns.png",
              "correlations.png", "pca_outliers.png", "analysis_results.pkl"):
        assert os.path.exists(os.path.join(out, f)), f


def test_cleanup_training_runs(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import importlib
    import cleanup_training_runs as c
    importlib.reload(c)
    root = tmp_path / "Training Runs"
    (root / "run_with" / "checkpoints").mkdir(parents=True)
    (root / "run_with" / "checkpoints" / "checkpoint_1.pth").write_bytes(b"x")
    (root / "run_without").mkdir(parents=True)
    empty = c.find_training_runs_without_checkpoints(str(root))
    assert [e.name for e in empty] == ["run_without"]


@pytest.mark.slow
def test_trajectory_plots(tmp_path):
    from trajectory_plots import plot_trajectories
    rng = np.random.default_rng(0)
    samples = np.zeros((3, 67))
    samples[:, 0] = rng.uniform(0.008, 0.095, 3)
    samples[:, 1] = rng.uniform(2, 5, 3)
    samples[:, 2:4] = rng.uniform(0, 2, (3, 2))
    ctrl = samples[:, 4:64].reshape(3, 20, 3)
    ctrl[:, :, 0] = rng.uniform(0, 2 * np.pi, (3, 20))
    ctrl[:, :, 1] = rng.uniform(0, 2 * np.pi, (3, 20))
    ctrl[:, :, 2] = rng.uniform(0, 1, (3, 20))
    out = str(tmp_path / "traj.png")
    plot_trajectories(samples, out, n=3)
    assert os.path.exists(out)
