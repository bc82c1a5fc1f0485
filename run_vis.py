#!/usr/bin/env python
"""Sampling / visualisation CLI (reference ``Reflected-Diffusion/run_vis.py``).

    python run_vis.py load_dir="Training Runs/2026.../" eval.batch_size=100

Loads the run's ``.hydra/config.yaml`` manifest, overrides the sampling
block from ``configs/vis.yaml`` (+CLI), restores the requested (or latest)
checkpoint, swaps in the EMA weights and generates ``eval.rounds`` batches,
saving ``images/samples_{r}.npz`` (uint8, NHWC) and a PNG grid — the same
artifacts as the reference.
"""
from __future__ import annotations

import io
import os
import sys
from datetime import datetime

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    import jax
    import jax.numpy as jnp

    from rdm_tpu.config import load_config, load_hydra_config_from_run
    from rdm_tpu.models import create_model
    from rdm_tpu.models.registry import get_cf_score_fn, get_score_fn
    from rdm_tpu.sampling import get_sampling_fn
    from rdm_tpu.sde import get_sde
    from rdm_tpu.training import checkpoints, get_optimizer, init_train_state
    from rdm_tpu.training.trainer import SAMPLING_EPS, _save_grid
    from rdm_tpu.utils import get_logger, makedirs

    cfg = load_config("vis", overrides=argv)
    load_cfg = load_hydra_config_from_run(cfg.load_dir)
    load_cfg.sampling = cfg.sampling  # overwrite the sampling instructions

    log_dir = os.path.join("vis", datetime.now().strftime("%Y.%m.%d"),
                           datetime.now().strftime("%H%M%S"))
    makedirs(log_dir)
    logger = get_logger(os.path.join(log_dir, "logs"))
    logger.info(f"loaded in config from {cfg.load_dir}")

    sde = get_sde(load_cfg)
    model = create_model(load_cfg)
    tx = get_optimizer(load_cfg)
    state = init_train_state(model, tx, load_cfg, rng=jax.random.PRNGKey(0))

    ckpt = cfg.eval.ckpt
    ckpt_dir = os.path.join(cfg.load_dir, "checkpoints")
    if ckpt == -1:
        path = checkpoints.latest_checkpoint(ckpt_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    else:
        path = os.path.join(ckpt_dir, f"checkpoint_{ckpt}.pth")
    state = checkpoints.restore_checkpoint(path, state, model_name=load_cfg.model.name)
    logger.info(f"Generating samples for checkpoint {path}")

    # Optional trained denoiser (sampling.denoiser == "network").
    denoiser_fn = None
    if cfg.sampling.denoiser == "network" and cfg.get("denoiser_path"):
        dn_cfg = load_hydra_config_from_run(cfg.denoiser_path)
        dn_model = create_model(dn_cfg)
        dn_state = init_train_state(dn_model, get_optimizer(dn_cfg), dn_cfg)
        dn_state = checkpoints.restore_checkpoint(
            os.path.join(cfg.denoiser_path, "checkpoints/checkpoint.pth"),
            dn_state, model_name=dn_cfg.model.name)
        denoiser_fn = lambda x, t: dn_model.apply(
            {"params": dn_state.ema.shadow_params}, x, t)

    B = cfg.eval.batch_size
    shape = (B, load_cfg.data.image_size,
             load_cfg.data.get("image_width", load_cfg.data.image_size),
             load_cfg.data.num_channels)
    sampling_fn = get_sampling_fn(load_cfg, sde, shape, SAMPLING_EPS)

    params = state.ema.shadow_params  # EMA copy_to (reference :58-59)
    use_cfg = bool(load_cfg.data.get("classes", False)) or load_cfg.model.name == "adm"

    def sample_once(key):
        if use_cfg:
            labels = jnp.full((B, load_cfg.model.get("num_classes", 1)),
                              float(cfg.get("label", 0)))
            score_fn = get_cf_score_fn(sde, model, params, labels,
                                       float(cfg.get("w", 0)))
        else:
            plain = get_score_fn(sde, model, params)
            score_fn = lambda x, t: plain(x, t)
        return sampling_fn(score_fn, key, denoiser_fn=denoiser_fn)[0]

    sample_once = jax.jit(sample_once)
    img_dir = os.path.join(log_dir, "images")
    makedirs(img_dir)
    key = jax.random.PRNGKey(0)
    for r in range(cfg.eval.rounds):
        logger.info(f"Round {r}")
        key, k = jax.random.split(key)
        samples = np.asarray(sample_once(k))
        samples_np = np.round(np.clip(samples, 0, 1) * 255).astype(np.uint8)
        _save_grid(samples, os.path.join(img_dir, f"samples_{r}.png"))
        with open(os.path.join(img_dir, f"samples_{r}.npz"), "wb") as fout:
            buf = io.BytesIO()
            np.savez_compressed(buf, samples=samples_np)
            fout.write(buf.getvalue())
    logger.info("Finished generating samples.")


if __name__ == "__main__":
    main()
