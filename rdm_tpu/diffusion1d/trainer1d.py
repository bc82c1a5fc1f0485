"""Trainer for the 1-D DDPM pipeline — functional JAX rebuild of the legacy
``Trainer1D`` (reference ``...diffusion.py:1126-1413``).

Semantics preserved:
  * 90/10 train/validation random split of the dataset;
  * Adam(lr, betas=(0.9, 0.99)) with gradient accumulation over
    ``gradient_accumulate_every`` microbatches and global-norm clip;
  * EMA with ``ema_pytorch`` semantics: update every ``ema_update_every``
    optimizer steps with decay warmup ``1 - (1 + step/inv_gamma)^-power``
    (gamma=1, power=2/3), after ``update_after_step`` burn-in;
  * per-epoch validation loss + keep-top-2 checkpoints by val loss,
    milestone files ``model-epoch-{n}.pt`` holding
    {step, model, opt, ema, scaler: None, version} (torch-pickle);
  * ``wandb`` logging replaced by a local metrics JSONL (the reference
    hardcodes an API key, intentionally not carried over — SURVEY.md
    "bugs to fix" list).

The gradient-accumulation microbatch loop is a ``lax.scan`` inside ONE
jitted update — no Python-level accumulation.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


class Trainer1D:
    def __init__(self, diffusion_model, dataset, *, train_batch_size=16,
                 gradient_accumulate_every=1, train_lr=1e-4,
                 train_num_steps=100_000, ema_update_every=10, ema_decay=0.995,
                 adam_betas=(0.9, 0.99), save_and_sample_every=1000,
                 num_samples=25, results_folder="./results", amp=False,
                 max_grad_norm=1.0, training_random_seed=0,
                 wandb_project_name="diffusion_for_cr3bp_indirect", **_):
        self.diffusion = diffusion_model
        self.model = diffusion_model.model
        self.batch_size = train_batch_size
        self.gradient_accumulate_every = gradient_accumulate_every
        self.train_num_steps = train_num_steps
        self.max_grad_norm = max_grad_norm
        self.ema_update_every = ema_update_every
        self.ema_decay = ema_decay
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.metrics_path = self.results_folder / "metrics.jsonl"

        rng = np.random.default_rng(training_random_seed)
        data = np.stack([np.asarray(dataset[i][0]) for i in range(len(dataset))])
        labels = np.stack([np.atleast_1d(np.asarray(dataset[i][1], np.float32))
                           for i in range(len(dataset))])
        if data.ndim == 3 and data.shape[1] == 1:  # torch (N, 1, L) -> (N, L, 1)
            data = data.transpose(0, 2, 1)
        elif data.ndim == 2:
            data = data[:, :, None]
        n = len(data)
        perm = rng.permutation(n)
        n_train = int(0.9 * n)
        self.train_data = data[perm[:n_train]].astype(np.float32)
        self.train_labels = labels[perm[:n_train]]
        self.val_data = data[perm[n_train:]].astype(np.float32)
        self.val_labels = labels[perm[n_train:]]
        self.batches_per_epoch = n // self.batch_size

        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(train_lr, b1=adam_betas[0], b2=adam_betas[1]),
        )

        key = jax.random.PRNGKey(training_random_seed)
        seq0 = jnp.zeros((2, diffusion_model.seq_length, self.model.channels))
        self.params = self.model.init(
            {"params": key, "cond_drop": key}, seq0, jnp.zeros((2,)),
            jnp.zeros((2, labels.shape[1])))["params"]
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree.map(jnp.asarray, self.params)
        self.step = 0
        self.best_checkpoints = []
        self._rng = jax.random.PRNGKey(training_random_seed + 1)

        diffusion = self.diffusion
        accum = self.gradient_accumulate_every

        def loss_fn(params, seq, classes, key, drop_key):
            return diffusion(params, key, seq, classes,
                             rngs={"cond_drop": drop_key})

        def update(params, opt_state, seqs, classes, key):
            # seqs: (accum, B, L, C) microbatches
            def micro(carry, inp):
                grads_acc, total = carry
                seq, cls, k1, k2 = inp
                loss, grads = jax.value_and_grad(loss_fn)(params, seq, cls, k1, k2)
                grads_acc = jax.tree.map(lambda a, g: a + g / accum, grads_acc, grads)
                return (grads_acc, total + loss / accum), None

            zero = jax.tree.map(jnp.zeros_like, params)
            ks = jax.random.split(key, 2 * accum).reshape(accum, 2, -1)
            (grads, total), _ = jax.lax.scan(
                micro, (zero, 0.0), (seqs, classes, ks[:, 0], ks[:, 1]))
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total

        self._update = jax.jit(update)
        self._val_loss = jax.jit(
            lambda params, seq, classes, key: diffusion(
                params, key, seq, classes,
                rngs={"cond_drop": jax.random.PRNGKey(0)}))

    # ------------------------------------------------------------------ #
    def _ema_beta(self, opt_step):
        """ema_pytorch decay warmup: 1 - (1 + step)^-(2/3), clamped to
        [0, ema_decay], with update_after_step=100 default burn-in."""
        step = max(opt_step - 100, 0)
        if step <= 0:
            return 0.0
        return float(np.clip(1 - (1 + step) ** (-2.0 / 3.0), 0.0, self.ema_decay))

    def _sample_batch(self, data, labels, batch, rng):
        idx = rng.integers(0, len(data), size=batch)
        return data[idx], labels[idx]

    def train(self):
        rng = np.random.default_rng(0)
        best_val = float("inf")
        while self.step < self.train_num_steps:
            seqs, classes = [], []
            for _ in range(self.gradient_accumulate_every):
                s, c = self._sample_batch(self.train_data, self.train_labels,
                                          self.batch_size, rng)
                seqs.append(s)
                classes.append(c)
            self._rng, k = jax.random.split(self._rng)
            self.params, self.opt_state, loss = self._update(
                self.params, self.opt_state,
                jnp.asarray(np.stack(seqs)), jnp.asarray(np.stack(classes)), k)
            self.step += 1
            self._log({"train_loss": float(loss), "step": self.step})

            if self.step % self.ema_update_every == 0:
                beta = self._ema_beta(self.step // self.ema_update_every)
                self.ema_params = jax.tree.map(
                    lambda e, p: e * beta + p * (1 - beta), self.ema_params,
                    self.params)

            if self.step % self.batches_per_epoch == 0 and self.step != 0:
                milestone = self.step // self.batches_per_epoch
                val_loss = self.compute_validation_loss()
                self._log({"val_loss": val_loss, "epoch": milestone})
                if val_loss < best_val:
                    self.save(f"epoch-{milestone}")
                    best_val = val_loss
                    self.update_best_checkpoints(val_loss, f"epoch-{milestone}")
        print("training complete")

    def compute_validation_loss(self) -> float:
        total, nb = 0.0, 0
        for i in range(0, len(self.val_data) - self.batch_size + 1, self.batch_size):
            seq = jnp.asarray(self.val_data[i:i + self.batch_size])
            cls = jnp.asarray(self.val_labels[i:i + self.batch_size])
            total += float(self._val_loss(self.params, seq, cls,
                                          jax.random.PRNGKey(i)))
            nb += 1
        return total / max(nb, 1)

    def update_best_checkpoints(self, val_loss, milestone):
        """Keep top-2 checkpoints by validation loss (reference ``:1390-1399``)."""
        self.best_checkpoints.append(
            (val_loss, str(self.results_folder / f"model-{milestone}.pt")))
        self.best_checkpoints.sort(key=lambda x: x[0])
        if len(self.best_checkpoints) > 2:
            _, path = self.best_checkpoints.pop(2)
            if os.path.exists(path):
                os.remove(path)

    # ------------------------------------------------------------------ #
    def save(self, milestone):
        import torch
        data = {
            "step": self.step,
            "model": jax.tree.map(lambda p: np.asarray(p), self.params),
            "opt": jax.tree.map(lambda p: np.asarray(p), self.opt_state),
            "ema": jax.tree.map(lambda p: np.asarray(p), self.ema_params),
            "scaler": None,
            "version": "rdm_tpu-1",
        }
        torch.save(data, str(self.results_folder / f"model-{milestone}.pt"))

    def load(self, milestone):
        import torch
        data = torch.load(str(self.results_folder / f"model-{milestone}.pt"),
                          map_location="cpu", weights_only=False)
        self.step = data["step"]
        self.params = jax.tree.map(lambda _, v: jnp.asarray(v), self.params,
                                   data["model"])
        self.opt_state = jax.tree.map(lambda _, v: jnp.asarray(v),
                                      self.opt_state, data["opt"])
        self.ema_params = jax.tree.map(lambda _, v: jnp.asarray(v),
                                       self.ema_params, data["ema"])

    def _log(self, payload: dict):
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(payload) + "\n")
