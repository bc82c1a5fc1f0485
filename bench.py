"""Headline benchmark: 1000-step reflected PC sampling throughput.

Reproduces the reference's benchmark workload
(``Benchmark/gto_halo_benchmarking.py:212-333``): NCSN++ GTO score model,
RVESDE(0.01, 5, N=1000), Euler-Maruyama predictor, no corrector,
classifier-free guidance as a 2B-batch forward with uniform-random labels —
but compiled as ONE ``lax.scan`` program on TPU with bf16 matmuls.

Baseline (BASELINE.md): A100-PCIE-40GB runs 28.9-34.3 s/batch regardless of
batch size (~0.35 traj/s at batch 10, ~3 traj/s extrapolated at batch 100)
because the reference dispatches 1000 sequential CUDA forwards.
``vs_baseline`` is measured against the 3 traj/s batch-100 extrapolation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_TRAJ_PER_SEC = 3.0  # A100, batch 100, extrapolated (BASELINE.md)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0,
                   help="0 = auto-tune over candidate batch sizes")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--attn_pallas", action="store_true", default=True,
                   help="fused VMEM attention blocks (default on)")
    p.add_argument("--no_attn_pallas", dest="attn_pallas", action="store_false")
    p.add_argument("--guidance_weight", type=float, default=0.0,
                   help="CFG weight; 0 (the reference benchmark default) "
                        "elides the unconditional forward at trace time")
    p.add_argument("--n_devices", type=int, default=1,
                   help="shard the sampling batch over this many local "
                        "devices (0 = all); >1 reports traj/s for the whole "
                        "mesh — the v5e-8 north-star measurement the moment "
                        "multi-chip hardware is attached (the sharding "
                        "itself is dryrun-validated on a virtual CPU mesh "
                        "by __graft_entry__.dryrun_multichip)")
    args = p.parse_args()

    from rdm_tpu.config import load_config
    from rdm_tpu.models import NCSNpp
    from rdm_tpu.models.registry import get_cf_score_fn
    from rdm_tpu.sampling import get_pc_sampler
    from rdm_tpu.sde import RVESDE
    from rdm_tpu.training import get_optimizer, init_train_state

    cfg = load_config("train")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    import dataclasses
    model = dataclasses.replace(NCSNpp.from_config(cfg), dtype=dtype,
                                attn_pallas=args.attn_pallas)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    params = state.params
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, args.steps)

    n_dev = args.n_devices or len(jax.devices())
    n_dev = max(1, min(n_dev, len(jax.devices())))
    print(f"devices: {jax.devices()} (using {n_dev})", file=sys.stderr)

    def make_runner(batch, weight, sde_use=None):
        sde_use = sde_use or sde
        shape = (batch, 9, 9, 1)
        sampler = get_pc_sampler(sde_use, shape, predictor="euler_maruyama",
                                 corrector="none", denoiser="none", eps=1e-5)

        def run(params, key):
            kl, ks = jax.random.split(key)
            labels = jax.random.uniform(kl, (batch, 1))
            # static scalar weight: 0.0 (the reference benchmark default,
            # run_benchmark.py --guidance_weight) makes the CFG combination
            # identically s_cond, so get_cf_score_fn skips the doubled
            # cond/uncond forward the reference always pays for
            score_fn = get_cf_score_fn(sde_use, model, params, labels, weight)
            x, nfe = sampler(score_fn, ks)
            return x

        if n_dev > 1:
            # DP mass sampling: batch sharded over the mesh, params
            # replicated; the scanned sampler has no cross-sample ops, so
            # the SPMD partitioner splits it with zero collectives in the
            # hot loop (sharding validated on the virtual CPU mesh).
            import numpy as np
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
            return jax.jit(run, out_shardings=NamedSharding(mesh, P("data")))
        return jax.jit(run)

    def _sync(x):
        # block_until_ready alone does not synchronise on the tunnelled
        # PJRT plugin; force a device->host readback of a scalar.
        return float(jnp.sum(x[:2]))

    def time_batch(batch, weight, sde_use=None):
        run = make_runner(batch, weight, sde_use)
        t0 = time.time()
        _sync(run(params, jax.random.PRNGKey(0)))
        compile_and_first = time.time() - t0
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            _sync(run(params, jax.random.PRNGKey(i + 1)))
            times.append(time.time() - t0)
        best = min(times)
        print(f"batch {batch}: first(incl compile) {compile_and_first:.2f}s, "
              f"steady {best:.3f}s -> {batch / best:.1f} traj/s", file=sys.stderr)
        return batch / best

    # batch 1024 is the tuned sweet spot on v5e with the CFG-doubled
    # forward; with the w=0 fast path (half the working set) 2048 is also
    # in play — auto mode measures both (see BENCH notes)
    if args.batch > 0:
        candidates = [args.batch]
    elif args.guidance_weight == 0.0:
        candidates = [1024, 2048]
    else:
        candidates = [1024]
    # per-device sweet spots: scale the global batch with the mesh
    candidates = [b * n_dev for b in candidates]
    best = max(time_batch(b, args.guidance_weight) for b in candidates)

    out = {
        "metric": "pc1000_sampling_throughput",
        "value": round(best, 2),
        "unit": "traj/s/chip" if n_dev == 1 else "traj/s",
        "vs_baseline": round(best / BASELINE_TRAJ_PER_SEC, 2),
    }
    if n_dev > 1:
        out["n_devices"] = n_dev
    if args.guidance_weight == 0.0:
        # keep perf honest at w != 0: also report the general-CFG path
        # (doubled cond/uncond forward — any non-zero weight costs the
        # same; 0.1 is the reference README's documented setting) so both
        # numbers land in the driver artifact, not just the w=0 fast path
        cfg_batch = (args.batch if args.batch > 0 else 1024) * n_dev
        out["value_cfg_w0.1"] = round(time_batch(cfg_batch, 0.1), 2)
    if args.steps == 1000 and args.guidance_weight == 0.0:
        # quality-verified short schedule: the NFE sweep
        # (scripts/nfe_sweep.py, benchmark_results/nfe_sweep.json) grades
        # 250-step PC samples within 0.005 feasible of the 1000-step
        # default under the df32 oracle at LM-30 + MBH-8, so the
        # effective production throughput is the 250-step number
        sde250 = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, 250)
        out["value_pc250"] = round(
            max(time_batch(b, 0.0, sde250) for b in candidates), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
