"""run_vis CLI end-to-end over a tiny trained run directory."""
import io
import os

import numpy as np
import pytest

from rdm_tpu.config import load_config, save_config_snapshot
from rdm_tpu.data import make_synthetic_gto_pkl
from rdm_tpu.training import trainer


@pytest.mark.slow
def test_run_vis_end_to_end(tmp_path, monkeypatch):
    pkl = make_synthetic_gto_pkl(str(tmp_path / "train.pkl"), n=64, seed=0)
    cfg = load_config("train", overrides=[
        f"data.pkl_path={pkl}",
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0",
        "training.batch_size=8", "eval.batch_size=8",
        "training.n_iters=2", "training.snapshot_freq=2",
        "training.eval_freq=10", "training.snapshot_freq_for_preemption=100",
        "training.snapshot_sampling=false",
        "sde.num_scales=6", "optim.warmup=1",
    ])
    work_dir = str(tmp_path / "run")
    os.makedirs(work_dir)
    save_config_snapshot(cfg, work_dir)
    trainer.run(cfg, work_dir)

    import run_vis
    monkeypatch.chdir(tmp_path)  # vis/<date>/<time> output tree
    run_vis.main([f"load_dir={work_dir}", "eval.batch_size=4", "eval.rounds=2"])

    vis_days = os.listdir(tmp_path / "vis")
    assert vis_days
    day = tmp_path / "vis" / vis_days[0]
    run = day / os.listdir(day)[0]
    imgs = os.listdir(run / "images")
    assert "samples_0.npz" in imgs and "samples_1.npz" in imgs
    with np.load(run / "images" / "samples_0.npz") as z:
        s = z["samples"]
    assert s.shape == (4, 9, 9, 1)
    assert s.dtype == np.uint8
