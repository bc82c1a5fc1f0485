"""Measure the full training-step time on the real TPU at the reference's
production batch size (reference healthy baseline: ~0.5-0.9 s/step at batch
4096 on A100-40GB, BASELINE.md)."""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rdm_tpu.config import load_config
from rdm_tpu.models import create_model
from rdm_tpu.sde import get_sde
from rdm_tpu.training import get_optimizer, init_train_state, make_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    cfg = load_config("train")
    model = create_model(cfg)
    sde = get_sde(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    # no donation: the tunnelled PJRT plugin rejects donated executions
    step_fn = jax.jit(make_train_step(
        sde, model, tx, reduce_mean=cfg.training.reduce_mean,
        likelihood_weighting=cfg.training.likelihood_weighting))

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0.05, 0.95, (args.batch, 9, 9, 1)), jnp.float32)
    labels = batch[:, 0, 0, :]

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, loss = step_fn(state, batch, labels, key)
    print(f"first step (incl compile): {time.time() - t0:.1f}s loss={float(loss):.3f}")
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, batch, labels, k)
    loss = float(loss)  # sync
    dt = (time.time() - t0) / args.steps
    print(f"steady: {dt * 1e3:.1f} ms/step at batch {args.batch} "
          f"(A100 reference ~500-900 ms) loss={loss:.3f}")


if __name__ == "__main__":
    main()
