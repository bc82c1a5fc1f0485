"""Microbenchmark sampler components on the real TPU.

Each call over the tunnelled PJRT plugin costs ~30-40 ms of round-trip
latency, so single-shot timings are meaningless; instead every variant is
measured as a ``lax.scan`` of K iterations for two K values and the
per-iteration cost is the slope: (T(K2) - T(K1)) / (K2 - K1).
"""
import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rdm_tpu.config import load_config
from rdm_tpu.models import NCSNpp
from rdm_tpu.models.registry import get_cf_score_fn
from rdm_tpu.sampling import get_pc_sampler
from rdm_tpu.sde import RVESDE
from rdm_tpu.training import get_optimizer, init_train_state


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.reshape(-1)[:2]))


def timed(fn, *args, repeats=3):
    sync(fn(*args))  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def slope(make_scan, k1=4, k2=54, repeats=3):
    f1, f2 = make_scan(k1), make_scan(k2)
    t1, t2 = timed(f1, repeats=repeats), timed(f2, repeats=repeats)
    return (t2 - t1) / (k2 - k1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dtypes", default="bf16")
    args = p.parse_args()
    B = args.batch

    cfg = load_config("train")
    tx = get_optimizer(cfg)
    sde = RVESDE(0.01, 5.0, 1000)
    names = {"bf16": jnp.bfloat16, "f32": jnp.float32}

    for dtype_name in args.dtypes.split(","):
        dtype = names[dtype_name]
        model = dataclasses.replace(NCSNpp.from_config(cfg), dtype=dtype)
        state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
        params = state.params
        x2 = jnp.linspace(0, 1, 2 * B * 81, dtype=jnp.float32).reshape(2 * B, 9, 9, 1)
        t2 = jnp.full((2 * B,), 0.5)
        l2 = jnp.zeros((2 * B, 1))

        def fwd_scan(K, m=model, prm=params):
            def prog(x):
                def body(h, _):
                    out = m.apply({"params": prm}, h, t2, l2)
                    return out.astype(h.dtype), None
                h, _ = jax.lax.scan(body, x, None, length=K)
                return h
            return jax.jit(prog).lower(x2).compile()

        per = slope(lambda K: (lambda c: (lambda: c(x2)))(fwd_scan(K)))
        print(f"[{dtype_name}] fwd/iter 2B={2*B}: {per*1e3:.3f} ms")

        model_na = dataclasses.replace(model, attn_resolutions=())
        st_na = init_train_state(model_na, tx, cfg, rng=jax.random.PRNGKey(0))
        per_na = slope(lambda K: (lambda c: (lambda: c(x2)))(fwd_scan(K, model_na, st_na.params)))
        print(f"[{dtype_name}] fwd/iter no-attn: {per_na*1e3:.3f} ms "
              f"(attn {1e3*(per-per_na):.3f} ms)")

        def pc_scan(K):
            s = RVESDE(0.01, 5.0, K + 1)
            sampler = get_pc_sampler(s, (B, 9, 9, 1), eps=1e-5)

            def prog(key):
                labels = jnp.zeros((B, 1))
                weight = jnp.zeros((B,))
                score_fn = get_cf_score_fn(s, model, params, labels, weight)
                return sampler(score_fn, key)[0]
            return jax.jit(prog).lower(jax.random.PRNGKey(0)).compile()

        per_pc = slope(lambda K: (lambda c: (lambda: c(jax.random.PRNGKey(0))))(pc_scan(K)))
        print(f"[{dtype_name}] pc step/iter: {per_pc*1e3:.3f} ms "
              f"(EM+reflect overhead {1e3*(per_pc-per):.3f} ms)")


if __name__ == "__main__":
    main()
