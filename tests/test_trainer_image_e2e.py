"""Image-config training smokes (VERDICT round-1 item 4).

The reference trains CIFAR10 / ImageNet32 / ImageNet64C through the same
``run_train.py`` driver as GTO-Halo (``configs/data/*.yaml``).  Round 1
covered those model families with forward goldens only; these tests run
2 real trainer steps + snapshot sampling per family on synthetic image
fixtures, covering in particular the ``class_labels=None`` host-batch
path (``trainer.py``: ``gl if classes else None`` — CIFAR10/ImageNet32
are unconditional) and the integer-label ADM path (ImageNet64C).
"""
import json
import os
import pickle
import re

import numpy as np
import pytest

from rdm_tpu.config import load_config, save_config_snapshot
from rdm_tpu.training import trainer

pytestmark = pytest.mark.slow


def _make_cifar10(root, n=32, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    per = -(-n // 5)
    for i in range(1, 6):
        d = {b"data": rng.integers(0, 256, (per, 3072), dtype=np.uint8),
             b"labels": rng.integers(0, 10, per).tolist()}
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)
    d = {b"data": rng.integers(0, 256, (8, 3072), dtype=np.uint8),
         b"labels": rng.integers(0, 10, 8).tolist()}
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump(d, f)


def _make_imagenet32(root, n=24, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    for split, m in (("train_32x32", n), ("valid_32x32", 8)):
        d = os.path.join(root, "ds_imagenet", split)
        os.makedirs(d, exist_ok=True)
        for i in range(m):
            arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im_{i:04d}.png"))


def _make_imagenet64c(root, n=24, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    for split, m in (("train", n), ("valid", 8)):
        d = os.path.join(root, "imagenet-64x64", split)
        os.makedirs(d, exist_ok=True)
        labels = []
        for i in range(m):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            name = f"im_{i:04d}.png"
            Image.fromarray(arr).save(os.path.join(d, name))
            labels.append([name, int(rng.integers(0, 1000))])
        with open(os.path.join(d, "dataset.json"), "w") as f:
            json.dump({"labels": labels}, f)


CASES = {
    "cifar10_ddpmpp": dict(
        fixture=_make_cifar10, data="cifar10", model="ddpmpp",
        overrides=["model.nf=16", "model.ch_mult=[1,2]",
                   "model.num_res_blocks=1", "model.attn_resolutions=[16]",
                   "model.dropout=0.0"],
        sample_shape=(8, 32, 32, 3)),
    "imagenet32_vdm": dict(
        fixture=_make_imagenet32, data="imagenet32", model="vdm",
        overrides=["model.channels=16", "model.num_blocks=2",
                   "model.dropout=0.0", "model.image_fourier_start=1",
                   "model.image_fourier_end=3"],
        sample_shape=(8, 32, 32, 3)),
    "imagenet64c_adm": dict(
        fixture=_make_imagenet64c, data="imagenet64c", model="adm",
        overrides=["model.model_channels=16", "model.channel_mult=[1,2]",
                   "model.num_blocks=1", "model.attn_resolutions=[16]",
                   "model.dropout=0.0"],
        sample_shape=(8, 64, 64, 3)),
}


@pytest.mark.parametrize("name", list(CASES))
def test_image_config_trains(name, tmp_path):
    case = CASES[name]
    dataroot = tmp_path / "data"
    os.makedirs(dataroot)
    case["fixture"](str(dataroot))

    cfg = load_config("train", overrides=[
        f"data={case['data']}", f"model={case['model']}",
        f"dataroot={dataroot}",
        "training.batch_size=8", "eval.batch_size=8",
        "training.n_iters=2", "training.snapshot_freq=2",
        "training.eval_freq=1", "training.snapshot_freq_for_preemption=2",
        "sde.num_scales=4",   # tiny snapshot sampler for CPU
        "optim.warmup=2",
    ] + case["overrides"])
    work_dir = str(tmp_path / "work")
    os.makedirs(work_dir)
    save_config_snapshot(cfg, work_dir)
    trainer.run(cfg, work_dir)

    log = open(os.path.join(work_dir, "logs")).read()
    losses = re.findall(r"step: (\d+), training_loss: ([\d.e+-]+)", log)
    assert len(losses) == 3  # steps 0..2
    assert all(np.isfinite(float(v)) for _, v in losses)
    evals = re.findall(r"step: (\d+), evaluation_loss: ([\d.e+-]+)", log)
    assert len(evals) == 3 and all(np.isfinite(float(v)) for _, v in evals)

    assert os.path.exists(
        os.path.join(work_dir, "checkpoints", "checkpoint_1.pth"))
    sample = np.load(os.path.join(work_dir, "samples", "iter_2", "sample_0.npy"))
    assert sample.shape == case["sample_shape"]
    assert sample.dtype == np.uint8
