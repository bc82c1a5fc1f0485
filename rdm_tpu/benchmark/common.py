"""Shared benchmark scaffolding: model loading from a training run dir and
batched TPU sampling (reference ``Benchmark/gto_halo_benchmarking.py:130-333``
and ``ml_statistics.py:105-245`` share the same structure)."""
from __future__ import annotations

import os
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.config import load_hydra_config_from_run
from rdm_tpu.models import create_model
from rdm_tpu.models.registry import get_cf_score_fn
from rdm_tpu.sampling import get_sampling_fn
from rdm_tpu.sde import get_sde
from rdm_tpu.training import checkpoints, get_optimizer, init_train_state

SAMPLING_EPS = 1e-5


class LoadedModel:
    """Model + EMA params restored from a run directory (the
    ``.hydra/config.yaml`` manifest contract)."""

    def __init__(self, model_path: str, config_path: str | None = None,
                 checkpoint_file: str | None = None):
        cfg_dir = config_path or model_path
        self.cfg = load_hydra_config_from_run(cfg_dir)
        self.model = create_model(self.cfg)
        self.sde = get_sde(self.cfg)
        tx = get_optimizer(self.cfg)
        state = init_train_state(self.model, tx, self.cfg, rng=jax.random.PRNGKey(0))

        # checkpoint search: checkpoints-meta first, then latest checkpoint_k
        # (reference gto_halo_benchmarking.py:155-163)
        if checkpoint_file is None:
            meta = os.path.join(model_path, "checkpoints-meta", "checkpoint.pth")
            checkpoint_file = meta if os.path.exists(meta) else \
                checkpoints.latest_checkpoint(os.path.join(model_path, "checkpoints"))
        if checkpoint_file is None:
            raise FileNotFoundError(f"no checkpoint under {model_path}")
        state = checkpoints.restore_checkpoint(checkpoint_file, state,
                                               model_name=self.cfg.model.name)
        self.checkpoint_file = checkpoint_file
        self.step = int(state.step)
        self.ema_params = state.ema.shadow_params  # ema.copy_to semantics


def generate_raw_samples(lm: LoadedModel, num_samples: int, batch_size: int,
                         guidance_weight: float = 0.0, seed: int = 0,
                         sde_override=None) -> Tuple[np.ndarray, List[float]]:
    """Batched EMA sampling with uniform-random class labels in [0, 1]
    (reference ``gto_halo_benchmarking.py:212-247``).  Returns flattened
    (N, 67) samples in model space plus per-batch wall times."""
    cfg = lm.cfg
    sde = sde_override or lm.sde
    shape = (batch_size, cfg.data.image_size,
             cfg.data.get("image_width", cfg.data.image_size),
             cfg.data.num_channels)
    sampling_fn = get_sampling_fn(cfg, sde, shape, SAMPLING_EPS)

    def run(params, key):
        kl, ks = jax.random.split(key)
        labels = jax.random.uniform(kl, (batch_size, cfg.model.get("num_classes", 1)))
        # static scalar: w == 0 elides the unconditional half of the
        # forward at trace time (see get_cf_score_fn fast path)
        score_fn = get_cf_score_fn(sde, lm.model, params, labels,
                                   float(guidance_weight))
        x, _ = sampling_fn(score_fn, ks)
        return x, labels

    run = jax.jit(run)

    num_batches = -(-num_samples // batch_size)
    chunks, times = [], []
    key = jax.random.PRNGKey(seed)
    for i in range(num_batches):
        key, k = jax.random.split(key)
        t0 = time.time()
        x, labels = run(lm.ema_params, k)
        x = np.asarray(x)  # device sync via host readback
        times.append(time.time() - t0)
        # Flatten (B, 9, 9, 1) -> (B, 81) -> first 67 (drop zero padding).
        # Position 0 stays the GENERATED value: the reference reads
        # samples[:, 0] as the normalised halo energy, not the conditioning
        # label (gto_halo_benchmarking.py:260-262).
        flat = x.reshape(x.shape[0], -1)[:, :67].copy()
        chunks.append(flat)
        print(f"Batch {i + 1}/{num_batches}: Generated {x.shape[0]} samples "
              f"in {times[-1]:.2f}s")

    flat = np.concatenate(chunks, axis=0)[:num_samples]
    return flat, times


def sampling_efficiency_metrics(sampling_times: List[float]) -> dict:
    """Reference ``gto_halo_benchmarking.py:586-597``."""
    return {
        "total_sampling_time": float(sum(sampling_times)),
        "average_sampling_time_per_sample": float(np.mean(sampling_times)),
        "sampling_time_std": float(np.std(sampling_times)),
        "samples_per_second": float(len(sampling_times) / sum(sampling_times)),
        "min_sampling_time": float(min(sampling_times)),
        "max_sampling_time": float(max(sampling_times)),
    }
