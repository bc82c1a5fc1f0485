"""Cross-framework sample-distribution parity check.

Loads a TPU-trained checkpoint (torch-pickle parity format) into BOTH
frameworks and runs the SAME 1000-step reflected PC sampling:

  * reference: torch NCSNpp + reference sampling.get_pc_sampler on CPU;
  * ours: Flax NCSNpp + scan-compiled sampler.

Compares per-dimension means/stds and the pooled empirical distributions
(KS statistic).  This is the strongest available distributional-parity
evidence without the reference's stripped trained checkpoints.

Usage:
  python scripts/cross_framework_sampling.py \
      --checkpoint "Training Runs/<ts>/checkpoints/checkpoint_3.pth" \
      --ref_batch 64 --our_batch 1024
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REF = "/root/reference/Reflected-Diffusion"


def sample_reference(ckpt_path, batch, steps, seed=0):
    sys.path.insert(0, REF)
    import torch
    import cube  # noqa: F401
    import sde_lib
    import sampling as ref_sampling
    from models import utils as mutils  # noqa: F401
    from models.ncsnpp import NCSNpp as RefNCSNpp
    from models.ema import ExponentialMovingAverage
    from types import SimpleNamespace

    loaded = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    mcfg = loaded["config"]["model"]
    ref_cfg = SimpleNamespace(model=SimpleNamespace(**mcfg))
    model = RefNCSNpp(ref_cfg)
    model.load_state_dict(loaded["model"], strict=True)
    ema = ExponentialMovingAverage(model.parameters(), decay=mcfg["ema_rate"])
    ema.load_state_dict(loaded["ema"])
    ema.copy_to(model.parameters())
    model.eval()

    scfg = loaded["config"]["sde"]
    sde = sde_lib.RVESDE(sigma_min=scfg["sigma_min"], sigma_max=scfg["sigma_max"],
                         N=steps)
    torch.manual_seed(seed)
    shape = (batch, 1, 9, 9)
    sampler = ref_sampling.get_pc_sampler(
        sde=sde, shape=shape,
        predictor=ref_sampling.get_predictor("euler_maruyama"),
        corrector=ref_sampling.get_corrector("none"),
        denoiser=ref_sampling.get_denoiser("none"),
        snr=0.01, n_steps=1, eps=1e-5, device="cpu")
    labels = torch.rand(batch, 1)
    with torch.no_grad():
        x, _ = sampler(model, weight=0.0, class_labels=labels)
    return x.numpy().reshape(batch, -1)[:, :67]


def sample_ours(ckpt_path, batch, steps, seed=0):
    import jax
    import jax.numpy as jnp

    from rdm_tpu.config import ConfigDict
    from rdm_tpu.models import NCSNpp
    from rdm_tpu.models.registry import get_cf_score_fn
    from rdm_tpu.sampling import get_pc_sampler
    from rdm_tpu.sde import RVESDE
    from rdm_tpu.training import checkpoints, get_optimizer, init_train_state

    import torch
    loaded = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    cfg = ConfigDict.wrap(loaded["config"])
    model = NCSNpp.from_config(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    state = checkpoints.restore_checkpoint(ckpt_path, state)
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, steps)

    shape = (batch, 9, 9, 1)
    sampler = get_pc_sampler(sde, shape, predictor="euler_maruyama",
                             corrector="none", denoiser="none", eps=1e-5)

    def run(params, key):
        kl, ks = jax.random.split(key)
        labels = jax.random.uniform(kl, (batch, 1))
        score_fn = get_cf_score_fn(sde, model, params, labels, jnp.zeros((batch,)))
        return sampler(score_fn, ks)[0]

    x = np.asarray(jax.jit(run)(state.ema.shadow_params, jax.random.PRNGKey(seed)))
    return x.reshape(batch, -1)[:, :67]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ref_batch", type=int, default=64)
    p.add_argument("--our_batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=1000)
    # The two halves run on different devices (ours: TPU, reference:
    # CPU torch) and at very different speeds; --ref_cache lets each be
    # produced independently and the comparison resumed later.
    p.add_argument("--ref_cache", default=None,
                   help="npy path: reuse reference samples if it exists, "
                        "else write them there after sampling")
    p.add_argument("--ref_only", action="store_true",
                   help="only produce the reference-side cache, then exit")
    args = p.parse_args()

    ref = None
    if args.ref_cache and os.path.exists(args.ref_cache):
        ref = np.load(args.ref_cache)
        print(f"reference: loaded {ref.shape} from {args.ref_cache}")
    if args.ref_only:
        if ref is None:
            ref = sample_reference(args.checkpoint, args.ref_batch, args.steps)
            np.save(args.ref_cache, ref)
        print(f"reference: {ref.shape} mean {ref.mean():.4f} std {ref.std():.4f}")
        return

    ours = sample_ours(args.checkpoint, args.our_batch, args.steps)
    print(f"ours: {ours.shape} mean {ours.mean():.4f} std {ours.std():.4f}")
    if ref is None:
        ref = sample_reference(args.checkpoint, args.ref_batch, args.steps)
        if args.ref_cache:
            np.save(args.ref_cache, ref)
    print(f"reference: {ref.shape} mean {ref.mean():.4f} std {ref.std():.4f}")

    from scipy.stats import ks_2samp
    ks = ks_2samp(ours.ravel(), ref.ravel())
    dim_mean_diff = np.abs(ours.mean(0) - ref.mean(0))
    print(f"pooled KS statistic: {ks.statistic:.4f} (p={ks.pvalue:.3f})")
    print(f"per-dim |mean diff|: mean {dim_mean_diff.mean():.4f} "
          f"max {dim_mean_diff.max():.4f}")
    print(f"std ratio: {ours.std() / ref.std():.4f}")


if __name__ == "__main__":
    main()
