#!/usr/bin/env python
"""Training CLI (reference ``Reflected-Diffusion/run_train.py:286-317``).

Hydra-style invocation without Hydra:

    python run_train.py model=ncsnpp data=gto_halo training.batch_size=4096

Creates ``Training Runs/<%Y.%m.%d_%H%M%S>/`` with the ``.hydra/config.yaml``
snapshot (the manifest contract consumed by run_vis / Benchmark), then runs
the DP training loop over all local TPU chips.  No mp.spawn: one process
drives the mesh (multi-host via ``jax.distributed.initialize`` when
JAX_COORDINATOR_ADDRESS is set).
"""
from __future__ import annotations

import os
import sys
from datetime import datetime


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()

    from rdm_tpu.config import load_config, save_config_snapshot
    from rdm_tpu.training import trainer
    from rdm_tpu.utils import get_logger, makedirs

    cfg = load_config("train", overrides=argv)

    timestamp = datetime.now().strftime("%Y.%m.%d_%H%M%S")
    work_dir = os.path.join("Training Runs", timestamp)
    makedirs(work_dir)
    save_config_snapshot(cfg, work_dir)

    logger = get_logger(os.path.join(work_dir, "logs"))
    logger.info(f"Training run started at: {timestamp}")
    logger.info(f"Run directory: {work_dir}")

    trainer.run(cfg, work_dir, checkpoint_path=cfg.get("checkpoint_path"))


if __name__ == "__main__":
    main()
