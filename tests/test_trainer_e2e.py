"""End-to-end trainer smoke test: a tiny config runs the full driver —
logging format, preemption checkpoint, snapshot checkpoint + EMA sampling,
resume — on the 8-device CPU mesh."""
import os
import re

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rdm_tpu.config import load_config, save_config_snapshot
from rdm_tpu.data import make_synthetic_gto_pkl
from rdm_tpu.training import trainer


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    pkl = make_synthetic_gto_pkl(str(tmp / "train.pkl"), n=128, seed=0)
    cfg = load_config("train", overrides=[
        f"data.pkl_path={pkl}",
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0",
        "training.batch_size=16", "eval.batch_size=16",
        "training.n_iters=6", "training.snapshot_freq=3",
        "training.eval_freq=2", "training.snapshot_freq_for_preemption=4",
        "sde.num_scales=8",  # tiny sampler for CPU
        "optim.warmup=2",
    ])
    work_dir = str(tmp / "work")
    os.makedirs(work_dir)
    save_config_snapshot(cfg, work_dir)
    trainer.run(cfg, work_dir)
    return cfg, work_dir


def test_log_format_parses(tiny_run):
    cfg, work_dir = tiny_run
    log = open(os.path.join(work_dir, "logs")).read()
    train_losses = re.findall(r"step: (\d+), training_loss: ([\d.e+-]+)", log)
    eval_losses = re.findall(r"step: (\d+), evaluation_loss: ([\d.e+-]+)", log)
    assert len(train_losses) == 7  # steps 0..6 with log_freq 1
    assert len(eval_losses) == 4   # steps 0, 2, 4, 6
    assert all(np.isfinite(float(v)) for _, v in train_losses)


def test_checkpoints_written(tiny_run):
    cfg, work_dir = tiny_run
    assert os.path.exists(os.path.join(work_dir, "checkpoints", "checkpoint_1.pth"))
    assert os.path.exists(os.path.join(work_dir, "checkpoints", "checkpoint_2.pth"))
    assert os.path.exists(os.path.join(work_dir, "checkpoints-meta", "checkpoint.pth"))


def test_snapshot_samples_written(tiny_run):
    cfg, work_dir = tiny_run
    p = os.path.join(work_dir, "samples", "iter_3", "sample_0.npy")
    assert os.path.exists(p)
    s = np.load(p)
    assert s.shape == (16, 9, 9, 1)
    assert s.dtype == np.uint8


def test_resume_from_meta(tiny_run):
    cfg, work_dir = tiny_run
    # Raising n_iters and rerunning resumes from the meta checkpoint written
    # at loop-step 4.  state.step is post-increment when saved (same as the
    # reference: losses.py:146 increments before run_train.py:150 saves), so
    # the resumed loop starts at 5.
    cfg.training.n_iters = 8
    trainer.run(cfg, work_dir)
    log = open(os.path.join(work_dir, "logs")).read()
    assert "Starting training loop at step 5." in log


def test_stall_watchdog_fires(tmp_path):
    """A stalled loop (no heartbeat) must terminate the process with the
    watchdog's dedicated exit code so launch/train_with_resume.sh can
    restart from the meta checkpoint."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import logging, time\n"
        "from rdm_tpu.training.trainer import _StallWatchdog\n"
        "log = logging.getLogger('t'); log.addHandler(logging.NullHandler())\n"
        "w = _StallWatchdog(1.0, log)\n"
        "w.beat()\n"
        "time.sleep(30)\n"  # never beats again -> watchdog should kill us
        "print('should not reach here')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert p.returncode == 17, (p.returncode, p.stdout, p.stderr)
    assert "should not reach here" not in p.stdout
