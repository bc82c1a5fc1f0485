"""Golden fixtures for the 1-D DDPM math by RUNNING the legacy reference
``GaussianDiffusion1D`` on CPU torch with a deterministic mock model
(out = 0.5 * x), pinning every buffer/conversion/sampler formula.

The legacy module imports ema_pytorch/wandb (absent here) — stubbed, since
only the diffusion class is exercised.

Usage: python scripts/gen_golden_diffusion1d.py
Writes: tests/golden/diffusion1d_golden.npz
"""
import sys
import types

import numpy as np

REF_DM = "/root/reference/GTO_Halo_DM/DM_scripts"


def main():
    # stub the unused heavy deps so the module imports
    import importlib.machinery
    for name in ("ema_pytorch", "wandb"):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        if name == "ema_pytorch":
            mod.EMA = object
        else:
            mod.init = lambda *a, **k: None
            mod.log = lambda *a, **k: None
        sys.modules[name] = mod

    sys.path.insert(0, REF_DM)
    import torch
    from classifier_free_guidance_cond_1d_improved_constrained_diffusion import (
        GaussianDiffusion1D, cosine_beta_schedule, linear_beta_schedule)

    class MockModel(torch.nn.Module):
        channels = 1

        def forward(self, x, t, classes, cond_drop_prob=None):
            return 0.5 * x

        def forward_with_cond_scale(self, x, t, classes, cond_scale=1.0,
                                    rescaled_phi=0.0):
            return 0.5 * x

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, L = 8, 67
    T = 40

    diff = GaussianDiffusion1D(
        MockModel(), seq_length=L, timesteps=T, objective="pred_noise",
        beta_schedule="cosine", auto_normalize=True, constraint_loss_type="NA",
        task_type="cr3bp")

    x_start = torch.tensor(rng.uniform(-1, 1, (B, 1, L)).astype(np.float32))
    noise = torch.tensor(rng.normal(size=(B, 1, L)).astype(np.float32))
    t = torch.tensor(rng.integers(0, T, B))
    classes = torch.tensor(rng.uniform(0, 1, (B, 1)).astype(np.float32))

    x_t = diff.q_sample(x_start, t, noise)
    pred_x0 = diff.predict_start_from_noise(x_t, t, noise)
    pred_noise_rt = diff.predict_noise_from_start(x_t, t, pred_x0)
    v = diff.predict_v(x_start, t, noise)
    x0_from_v = diff.predict_start_from_v(x_t, t, v)
    post_mean, post_var, post_logvar = diff.q_posterior(x_start, x_t, t)
    mean, var, logvar, x0_hat = diff.p_mean_variance(
        x_t, t, classes, cond_scale=6.0, rescaled_phi=0.7)

    with torch.no_grad():
        loss_na = diff.p_losses(x_start, t, classes=classes, noise=noise)

    # deterministic DDIM trajectory (eta=0) from a fixed z
    diff_ddim = GaussianDiffusion1D(
        MockModel(), seq_length=L, timesteps=T, sampling_timesteps=10,
        objective="pred_noise", beta_schedule="cosine",
        constraint_loss_type="NA", task_type="cr3bp")
    z0 = torch.tensor(rng.normal(size=(B, 1, L)).astype(np.float32))
    # replicate ddim_sample internals with fixed img (reference :817-851)
    total, S, eta = T, 10, 0.0
    times = torch.linspace(-1, total - 1, steps=S + 1).int().tolist()[::-1]
    pairs = list(zip(times[:-1], times[1:]))
    img = z0.clone()
    with torch.no_grad():
        for time, time_next in pairs:
            tc = torch.full((B,), time, dtype=torch.long)
            pred_noise, x0_p, *_ = diff_ddim.model_predictions(
                img, tc, classes, cond_scale=6.0, clip_x_start=True)
            if time_next < 0:
                img = x0_p
                continue
            alpha = diff_ddim.alphas_cumprod[time]
            alpha_next = diff_ddim.alphas_cumprod[time_next]
            sigma = eta * ((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)).sqrt()
            c = (1 - alpha_next - sigma**2).sqrt()
            img = x0_p * alpha_next.sqrt() + c * pred_noise
    from classifier_free_guidance_cond_1d_improved_constrained_diffusion import \
        unnormalize_to_zero_to_one
    ddim_out = unnormalize_to_zero_to_one(img)

    np.savez_compressed(
        "tests/golden/diffusion1d_golden.npz",
        betas=diff.betas.numpy(),
        alphas_cumprod=diff.alphas_cumprod.numpy(),
        posterior_variance=diff.posterior_variance.numpy(),
        posterior_log_variance_clipped=diff.posterior_log_variance_clipped.numpy(),
        posterior_mean_coef1=diff.posterior_mean_coef1.numpy(),
        posterior_mean_coef2=diff.posterior_mean_coef2.numpy(),
        loss_weight=diff.loss_weight.numpy(),
        linear_betas=linear_beta_schedule(T).numpy(),
        x_start=x_start.numpy(), noise=noise.numpy(), t=t.numpy(),
        classes=classes.numpy(),
        x_t=x_t.numpy(), pred_x0=pred_x0.numpy(),
        pred_noise_rt=pred_noise_rt.numpy(), v=v.numpy(),
        x0_from_v=x0_from_v.numpy(),
        post_mean=post_mean.numpy(), post_logvar=post_logvar.numpy(),
        p_mean=mean.numpy(), p_logvar=logvar.numpy(), x0_hat=x0_hat.numpy(),
        loss_na=np.array(float(loss_na)),
        z0=z0.numpy(), ddim_out=ddim_out.numpy(),
    )
    print("wrote tests/golden/diffusion1d_golden.npz; loss_na =", float(loss_na))


if __name__ == "__main__":
    main()
