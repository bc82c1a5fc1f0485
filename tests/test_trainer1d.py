"""Trainer1D + 1-D CLI end-to-end tests on tiny configs."""
import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pkl_1d(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("d1")
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (128, 67)).astype(np.float32)  # [alpha | 66 vec]
    path = str(tmp / "cr3bp.pkl")
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


@pytest.mark.slow
def test_train_cli_end_to_end(pkl_1d, tmp_path):
    import train_1d
    out = str(tmp_path / "res")
    train_1d.main([
        "--data_path", pkl_1d, "--unet_dim", "16", "--unet_dim_mults", "1,2,4",
        "--embed_class_layers_dims", "16,16", "--timesteps", "8",
        "--seq_length", "66", "--batch_size", "16", "--max_epoch", "2",
        "--training_data_num", "128", "--result_folder", out,
        "--cond_drop_prob", "0.1"])
    # results folder with metrics + at least one milestone checkpoint
    sub = [d for d in os.listdir(out)][0]
    files = os.listdir(os.path.join(out, sub))
    assert "metrics.jsonl" in files
    assert any(f.startswith("model-epoch-") for f in files)
    metrics = [json.loads(l) for l in open(os.path.join(out, sub, "metrics.jsonl"))]
    train_losses = [m["train_loss"] for m in metrics if "train_loss" in m]
    val_losses = [m["val_loss"] for m in metrics if "val_loss" in m]
    assert len(train_losses) >= 14 and len(val_losses) >= 1
    assert all(np.isfinite(train_losses))


@pytest.mark.slow
def test_sample_cli_end_to_end(pkl_1d, tmp_path):
    import train_1d
    import sample_1d
    out = str(tmp_path / "res")
    train_1d.main([
        "--data_path", pkl_1d, "--unet_dim", "16", "--unet_dim_mults", "1,2,4",
        "--embed_class_layers_dims", "16,16", "--timesteps", "8",
        "--seq_length", "66", "--batch_size", "16", "--max_epoch", "1",
        "--training_data_num", "128", "--result_folder", out])
    sub = os.path.join(out, os.listdir(out)[0])
    ckpt = [f for f in os.listdir(sub) if f.startswith("model-epoch-")][0]

    sample_out = str(tmp_path / "samples.pkl")
    sample_1d.main([
        "--checkpoint", os.path.join(sub, ckpt), "--sample_num", "8",
        "--batch_size", "8", "--unet_dim", "16", "--unet_dim_mults", "1,2,4",
        "--embed_class_layers_dims", "16,16", "--timesteps", "8",
        "--seq_length", "66", "--output", sample_out])
    with open(sample_out, "rb") as f:
        full = pickle.load(f)
    assert full.shape == (8, 67)
    # physical ranges
    assert (full[:, 0] >= 0.008) .all() and (full[:, 0] <= 0.095).all()
    assert (full[:, 1] >= 0).all() and (full[:, 1] <= 40).all()
    ctrl = full[:, 4:64].reshape(-1, 20, 3)
    assert (ctrl[:, :, 2] >= 0).all() and (ctrl[:, :, 2] <= 1.0).all()
    assert (full[:, 64] >= 408).all() and (full[:, 64] <= 470).all()
