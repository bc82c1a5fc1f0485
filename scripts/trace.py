"""Capture a jax.profiler trace of the hot paths (SURVEY.md section 5:
the TPU-native replacement for the reference's wall-clock-only telemetry).

    python scripts/trace.py --what sample --outdir /tmp/jax-trace
    tensorboard --logdir /tmp/jax-trace   # or xprof
"""
import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="sample", choices=["sample", "train"])
    p.add_argument("--outdir", default="/tmp/jax-trace")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()

    import dataclasses

    from rdm_tpu.config import load_config
    from rdm_tpu.models import NCSNpp
    from rdm_tpu.models.registry import get_cf_score_fn
    from rdm_tpu.sampling import get_pc_sampler
    from rdm_tpu.sde import RVESDE
    from rdm_tpu.training import (get_optimizer, init_train_state,
                                  make_train_step)

    cfg = load_config("train")
    model = dataclasses.replace(NCSNpp.from_config(cfg), dtype=jnp.bfloat16,
                                attn_pallas=True)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, args.steps)

    if args.what == "sample":
        sampler = get_pc_sampler(sde, (args.batch, 9, 9, 1), eps=1e-5)

        def run(params, key):
            labels = jnp.zeros((args.batch, 1))
            score_fn = get_cf_score_fn(sde, model, params, labels,
                                       jnp.zeros((args.batch,)))
            return sampler(score_fn, key)[0]

        run = jax.jit(run)
        run(state.params, jax.random.PRNGKey(0)).block_until_ready()  # compile
        with jax.profiler.trace(args.outdir):
            out = run(state.params, jax.random.PRNGKey(1))
            float(jnp.sum(out[:1].astype(jnp.float32)))
    else:
        step = jax.jit(make_train_step(sde, model, tx))
        batch = jax.random.uniform(jax.random.PRNGKey(0), (args.batch, 9, 9, 1))
        labels = batch[:, 0, 0, :]
        s, loss = step(state, batch, labels, jax.random.PRNGKey(1))
        float(loss)
        with jax.profiler.trace(args.outdir):
            for i in range(5):
                s, loss = step(s, batch, labels, jax.random.PRNGKey(i))
            float(loss)
    print(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
