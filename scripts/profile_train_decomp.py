"""Decompose the training step's time and HBM traffic (VERDICT round-4
item 4: the step runs at 67% of HBM peak with no per-component
accounting, unlike the sampler which has a structural-floor argument).

Method: every component is compiled as a ``lax.scan`` of K iterations
and timed at two K values; the per-iteration cost is the slope — the
same tunnel-latency-immune scheme as ``profile_sampler.py``.  XLA cost
analysis (flops / bytes accessed) is read off each compiled program, so
the HBM story does not depend on timers at all.

Components:
  * full    — value_and_grad + clip/Adam + EMA (the production step)
  * loss    — loss value only (forward + score_hk target, no backward)
  * fwd     — score-model forward only (train mode, dropout+cond-drop)
  * target  — cube.score_hk target computation alone
  * opt     — clip/Adam/EMA update alone on frozen gradients
  * draws   — per-step randomness (t, z, dropout/cond-drop key splits)

Also measured: per-sample scaling at batch {4096, 8192, 16384}, and the
full step under the ``rbg`` PRNG (threefry bit generation is pure VPU
work and a known TPU cost; rbg uses the hardware RNG path).

Usage:  python scripts/profile_train_decomp.py [--batch 4096]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rdm_tpu.config import load_config
from rdm_tpu.ops import cube
from rdm_tpu.sde import get_sde
from rdm_tpu.training import get_optimizer, init_train_state, make_train_step
from rdm_tpu.training.losses import get_loss_fn, _bcast


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.reshape(-1)[:1]))


def timed(call, repeats=3):
    _sync(call())  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        _sync(call())
        ts.append(time.time() - t0)
    return min(ts)


def slope(make_compiled, k1=2, k2=10, repeats=3):
    c1, c2 = make_compiled(k1), make_compiled(k2)
    t1 = timed(c1)
    t2 = timed(c2)
    return (t2 - t1) / (k2 - k1)


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops", float("nan")), ca.get("bytes accessed",
                                                     float("nan"))
    except Exception:
        return float("nan"), float("nan")


def build(batch, prng_impl=None, dtype=jnp.bfloat16):
    """Production training configuration: bf16 matmuls + fused Pallas
    attention (the config of the round-4 61.4 ms/step measurement and of
    bench.py) — create_model's f32 default would profile a 2.3x-heavier
    program."""
    import dataclasses
    from rdm_tpu.models import NCSNpp

    cfg = load_config("train")
    model = dataclasses.replace(NCSNpp.from_config(cfg), dtype=dtype,
                                attn_pallas=True)
    sde = get_sde(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (batch, 9, 9, 1)), jnp.float32)
    labels = x[:, 0, 0, :]
    if prng_impl:
        key = jax.random.key(0, impl=prng_impl)
    else:
        key = jax.random.PRNGKey(0)
    return cfg, model, sde, tx, state, x, labels, key


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--batches", default="4096,8192,16384")
    p.add_argument("--skip_scaling", action="store_true")
    p.add_argument("--skip_rbg", action="store_true")
    args = p.parse_args()
    B = args.batch

    cfg, model, sde, tx, state, x, labels, key = build(B)
    step_fn = make_train_step(sde, model, tx,
                              reduce_mean=cfg.training.reduce_mean,
                              likelihood_weighting=cfg.training.likelihood_weighting)
    loss_fn = get_loss_fn(sde, model, train=True,
                          reduce_mean=cfg.training.reduce_mean,
                          likelihood_weighting=cfg.training.likelihood_weighting)

    def scan_of(body, init_carry):
        def make(K):
            def prog(carry):
                return jax.lax.scan(lambda c, _: (body(c), None), carry,
                                    None, length=K)[0]
            compiled = jax.jit(prog).lower(init_carry).compile()
            caller = lambda: compiled(init_carry)
            caller.cost = lambda: cost(compiled)
            return caller
        return make

    progs = {}

    # full production step
    progs["full"] = scan_of(
        lambda c: (step_fn(c[0], x, labels, c[1])[0],
                   jax.random.split(c[1])[0]), (state, key))

    # loss value only (forward + target, no backward/update)
    def loss_body(c):
        k, acc = c
        l = loss_fn(state.params, x, labels, k)
        return jax.random.split(k)[0], acc + l
    progs["loss"] = scan_of(loss_body, (key, jnp.float32(0)))

    # forward only (train-mode rngs live)
    _, time_cond = sde.marginal_prob(jnp.zeros_like(x), jnp.full((B,), 0.5))

    def fwd_body(c):
        h, k = c
        kd, kc, kn = jax.random.split(k, 3)
        out = model.apply({"params": state.params}, h, time_cond,
                          class_labels=labels, train=True,
                          rngs={"dropout": kd, "cond_drop": kc})
        return out.astype(h.dtype), kn
    progs["fwd"] = scan_of(fwd_body, (x, key))

    # score_hk target alone
    def tgt_body(c):
        h, k = c
        kt, kz, kn = jax.random.split(k, 3)
        t = jax.random.uniform(kt, (B,), h.dtype, 1e-5, sde.T)
        z = jax.random.normal(kz, h.shape, h.dtype)
        mean, std = sde.marginal_prob(h, t)
        perturbed = cube.reflect(mean + _bcast(std, h) * z)
        tgt = cube.score_hk(perturbed, mean, std)
        return h + 0 * tgt, kn
    progs["target+draws"] = scan_of(tgt_body, (x, key))

    # optimizer alone on frozen grads
    grads = jax.tree_util.tree_map(lambda p_: jnp.ones_like(p_) * 1e-4,
                                   state.params)
    from rdm_tpu.training.losses import _guarded_update

    def opt_body(s):
        return _guarded_update(s, jnp.float32(1.0), grads, tx)
    progs["opt"] = scan_of(opt_body, state)

    print(f"== component decomposition at batch {B} "
          f"(scan-slope; XLA cost analysis per compiled program) ==")
    for name, make in progs.items():
        fl, by = make(1).cost()
        per = slope(make)
        print(f"{name:13s} {per*1e3:8.2f} ms/iter   "
              f"{fl/1e9:8.1f} GF   {by/1e9:8.2f} GB accessed   "
              f"-> {by/per/1e9:6.0f} GB/s eff", flush=True)

    if not args.skip_scaling:
        print("== per-sample scaling (full step) ==")
        for b in [int(v) for v in args.batches.split(",")]:
            _, _, sde_b, tx_b, st_b, xb, lb, kb = build(b)
            sf = make_train_step(sde_b, model, tx_b,
                                 reduce_mean=cfg.training.reduce_mean,
                                 likelihood_weighting=cfg.training.likelihood_weighting)
            mk = scan_of(lambda c: (sf(c[0], xb, lb, c[1])[0],
                                    jax.random.split(c[1])[0]), (st_b, kb))
            fl, by = mk(1).cost()
            per = slope(mk)
            print(f"batch {b:6d}: {per*1e3:8.2f} ms/step  "
                  f"{per/b*1e6:6.2f} us/sample  {by/1e9:7.2f} GB  "
                  f"-> {by/per/1e9:6.0f} GB/s eff", flush=True)

    if not args.skip_rbg:
        print("== PRNG impl (full step, batch", B, ") ==")
        for impl in ["threefry2x32", "rbg"]:
            _, _, sde_b, tx_b, st_b, xb, lb, kb = build(B, prng_impl=impl)
            sf = make_train_step(sde_b, model, tx_b,
                                 reduce_mean=cfg.training.reduce_mean,
                                 likelihood_weighting=cfg.training.likelihood_weighting)
            mk = scan_of(lambda c: (sf(c[0], xb, lb, c[1])[0],
                                    jax.random.split(c[1])[0]), (st_b, kb))
            fl, by = mk(1).cost()
            per = slope(mk)
            print(f"{impl:14s}: {per*1e3:8.2f} ms/step  {by/1e9:7.2f} GB",
                  flush=True)


if __name__ == "__main__":
    main()
